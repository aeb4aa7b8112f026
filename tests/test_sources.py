"""Graph text-source tests: adjacency/snap parsing, ETL, end-to-end greedy
partitioning over the reference's native formats."""

import numpy as np
import pytest

from sgp_sketch.sources import (
    parse_adjacency_batch,
    partition_graph_stream,
    read_adjacency_text,
    read_snap_edges,
    snap_to_adjacency,
    write_partition_map,
)


@pytest.fixture()
def adj_file(tmp_path):
    # clustered graph: 4 clusters x 10 vertices, ring edges inside cluster
    lines = ["# comment line"]
    for c in range(4):
        for i in range(10):
            v = f"c{c}v{i}"
            nbrs = [f"c{c}v{j}" for j in (i - 1, i - 2) if j >= 0]
            lines.append(f"{v} {len(nbrs)} {' '.join(nbrs)}".strip())
    p = tmp_path / "adj.txt"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


@pytest.fixture()
def snap_file(tmp_path):
    lines = ["# snap", "a b", "b c", "c a", "a a", "b a"]
    p = tmp_path / "edges.txt"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


class TestAdjacencySource:
    def test_parse_and_read(self, adj_file):
        ds = read_adjacency_text(adj_file)
        rows = ds.take_all()
        assert len(rows) == 40  # comment skipped
        by_v = {r["vertex"]: r for r in rows}
        assert by_v["c0v0"]["degree"] == 0
        assert by_v["c2v5"]["neighbors"] == ["c2v4", "c2v3"]

    def test_labeled_filtering(self):
        import pyarrow as pa

        batch = pa.table({"text": ["v1 2 knows,a,123 likes,b", "v2 1 knows,c"]})
        out = parse_adjacency_batch(batch, labeled=True, edge_labels={"knows"})
        assert out["neighbors"].to_pylist() == [["a"], ["c"]]

    def test_snap_reader_drops_self_loops(self, snap_file):
        rows = read_snap_edges(snap_file).take_all()
        assert {(r["src"], r["dst"]) for r in rows} == {
            ("a", "b"), ("b", "c"), ("c", "a"), ("b", "a")
        }

    def test_snap_to_adjacency(self, snap_file):
        adj = snap_to_adjacency(read_snap_edges(snap_file)).take_all()
        by_v = {r["vertex"]: r for r in adj}
        assert by_v["a"]["neighbors"] == ["b"]
        assert by_v["b"]["degree"] == 2  # a, c deduped+sorted


class TestGraphPartitionPipeline:
    def test_end_to_end_ldg_beats_hash(self, adj_file, tmp_path):
        ds = read_adjacency_text(adj_file)
        pm_ldg, m_ldg = partition_graph_stream(ds, 4, "ldg",
                                               total_vertices=40, seed=3)
        ds2 = read_adjacency_text(adj_file)
        pm_hash, m_hash = partition_graph_stream(ds2, 4, "hash",
                                                 total_vertices=40)
        assert len(pm_ldg) == 40
        assert m_ldg["num_edges"] == m_hash["num_edges"]
        assert m_ldg["num_edge_cut"] < m_hash["num_edge_cut"]
        # balance within slack (+1 item pre-insert check)
        assert max(m_ldg["sizes"]) < m_ldg["capacity"] + 1.0

        out = tmp_path / "pm.parquet"
        write_partition_map(pm_ldg, str(out))
        import pyarrow.parquet as pq

        rt = pq.read_table(str(out))
        assert rt.num_rows == 40
        assert set(rt.column_names) == {"vertex", "partition"}

    def test_deterministic(self, adj_file):
        pm1, _ = partition_graph_stream(read_adjacency_text(adj_file), 4,
                                        "fennel", total_vertices=40,
                                        total_edges=68, seed=9)
        pm2, _ = partition_graph_stream(read_adjacency_text(adj_file), 4,
                                        "fennel", total_vertices=40,
                                        total_edges=68, seed=9)
        assert pm1.equals(pm2)


class TestSNBSource:
    def test_csv_compose_undirect(self, tmp_path):
        p = tmp_path / "person_knows_person.csv"
        p.write_text(
            "Person.id|Person.id.1|creationDate\n"
            "1|2|2010-01-01T00:00:00.000+0000\n"
            "2|3|2011-06-15T12:30:00.000+0000\n"
        )
        from sgp_sketch.sources import (
            read_snb_edge_csv,
            snap_to_adjacency,
            undirect_edges,
        )

        edges = read_snb_edge_csv(str(p), src_entity="person", dst_entity="person")
        rows = sorted((r["src"], r["dst"]) for r in edges.take_all())
        assert rows == [("person:1", "person:2"), ("person:2", "person:3")]
        ts = [r["ts"] for r in edges.take_all()]
        assert all(t > 0 for t in ts)  # parsed epoch timestamps

        und = undirect_edges(edges)
        assert und.count() == 4
        adj = {r["vertex"]: r["neighbors"] for r in snap_to_adjacency(und).take_all()}
        assert adj["person:2"] == ["person:1", "person:3"]
