"""Graph text-source tests: adjacency/snap parsing, ETL, end-to-end greedy
partitioning over the reference's native formats."""

import numpy as np
import pandas as pd
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


class TestSNBPropertyGraph:
    """SNB ingestion round trip: pipe CSVs -> labeled adjacency ->
    partition -> M2 label filtering (csv-converter.scala:81-210,
    SNBParser.groovy:88-302 semantics)."""

    @pytest.fixture()
    def snb_dir(self, tmp_path):
        d = tmp_path / "snb"
        d.mkdir()
        (d / "person_knows_person_0_0.csv").write_text(
            "Person.id|Person.id.1|creationDate\n"
            "1|2|2012-01-02T03:04:05.678+0000\n"
            "2|3|2012-02-02T03:04:05.678+0000\n")
        (d / "person_hasInterest_tag_0_0.csv").write_text(
            "Person.id|Tag.id\n1|10\n3|11\n")
        (d / "tag_hasType_tagclass_0_0.csv").write_text(
            "Tag.id|TagClass.id\n10|100\n11|100\n")
        (d / "person_0_0.csv").write_text(
            "id|firstName|lastName|birthday|creationDate\n"
            "1|Alice|A|1980-05-01|2012-01-01T00:00:00.000+0000\n"
            "2|Bob|B|1985-06-02|2012-01-02T00:00:00.000+0000\n"
            "3|Carol|C|1990-07-03|2012-01-03T00:00:00.000+0000\n")
        (d / "tag_0_0.csv").write_text("id|name\n10|rock\n11|jazz\n")
        (d / "person_email_emailaddress_0_0.csv").write_text(
            "Person.id|email\n1|a@x.com\n1|a@y.com\n2|b@x.com\n")
        return str(d)

    def test_discovery_classifies_tables(self, snb_dir):
        from sgp_sketch.snb import discover_snb_dir

        edges, verts = discover_snb_dir(snb_dir)
        assert {(e["src"], e["elabel"], e["dst"]) for e in edges} == {
            ("person", "knows", "person"),
            ("person", "hasInterest", "tag"),
            ("tag", "hasType", "tagclass")}
        assert {v["entity"] for v in verts} == {"person", "tag"}
        # the list-property sidecar is NOT an edge table
        assert all(e["elabel"] != "email" for e in edges)

    def test_union_and_full_outer_alignment(self, snb_dir):
        from sgp_sketch.snb import load_snb_graph

        g = load_snb_graph(snb_dir)
        adj = {r["vertex"]: r
               for r in g["adjacency"].take_all()}
        # epoch millis on the knows edge token
        assert "knows,person:2,1325473445678" \
            in adj["person:1"]["out_neighbors"]
        assert adj["person:1"]["degree"] == 2
        # full outer: tagclass:100 has in-edges only but still gets a row
        assert adj["tagclass:100"]["degree"] == 0
        assert sorted(adj["tagclass:100"]["in_neighbors"]) == [
            "hasType,tag:10", "hasType,tag:11"]
        # in-edge carries the source vertex
        assert adj["person:2"]["in_neighbors"] == [
            "knows,person:1,1325473445678"]

    def test_vertex_properties_typed(self, snb_dir):
        from sgp_sketch.snb import load_snb_graph, load_snb_list_property

        g = load_snb_graph(snb_dir)
        person = {r["iid"]: r for r in g["vertices"]["person"].take_all()}
        alice = person["person:1"]
        assert alice["iid_long"] == 1 and alice["label"] == "person"
        assert alice["firstName"] == "Alice"
        assert alice["birthday"] == 325987200000  # 1980-05-01 UTC millis
        assert alice["creationDate"] == 1325376000000
        emails = {r["iid"]: sorted(r["email"]) for r in
                  load_snb_list_property(
                      f"{snb_dir}/person_email_emailaddress_0_0.csv",
                      "person", "email").take_all()}
        assert emails == {"person:1": ["a@x.com", "a@y.com"],
                          "person:2": ["b@x.com"]}

    def test_roundtrip_parse_filter_partition(self, snb_dir, tmp_path):
        import ray.data as rd

        from sgp_sketch.snb import adjacency_text_lines, load_snb_graph
        from sgp_sketch.sources import (parse_adjacency_batch,
                                        partition_graph_stream)

        g = load_snb_graph(snb_dir)
        lines = sorted(
            r["text"] for r in adjacency_text_lines(g["adjacency"])
            .take_all())
        path = tmp_path / "snb_adj.txt"
        path.write_text("\n".join(lines) + "\n")
        # M2 label filter: knows-only adjacency keeps person targets only
        parsed = rd.read_text(str(path)).map_batches(
            lambda t: parse_adjacency_batch(t, labeled=True,
                                            edge_labels={"knows"}),
            batch_format="pyarrow")
        adj = {r["vertex"]: list(r["neighbors"]) for r in parsed.take_all()}
        assert adj["person:1"] == ["person:2"]
        assert adj["person:2"] == ["person:3"]
        assert adj["tag:10"] == []
        # T1 partitioner consumes the parsed stream directly
        pm, metrics = partition_graph_stream(parsed, 2, "ldg",
                                             total_vertices=len(adj))
        assert set(pm["vertex"]) == set(adj)
        assert metrics["num_items"] == len(adj)

    def test_join_vertex_properties(self, snb_dir):
        from sgp_sketch.snb import join_vertex_properties, load_snb_graph

        g = load_snb_graph(snb_dir)
        enriched = join_vertex_properties(
            g["adjacency"], g["vertices"]["person"],
            props=["firstName", "birthday"])
        rows = {r["vertex"]: r for r in enriched.take_all()}
        assert rows["person:1"]["firstName"] == "Alice"
        assert rows["person:1"]["birthday"] == 325987200000
        assert rows["person:1"]["degree"] == 2
        # non-person vertices survive the left join with null props
        assert pd.isna(rows["tag:10"]["firstName"])

    def test_alignment_invariants_random_graph(self, tmp_path):
        """Property check on a seeded random multi-table graph: out-degree
        sum == per-table edge counts, every endpoint gets a row, and out
        tokens mirror in tokens exactly (conservation under alignment)."""
        import ray.data as rd

        from sgp_sketch.snb import (load_snb_edges,
                                    snb_to_labeled_adjacency)

        rng = np.random.default_rng(17)
        d = tmp_path / "snb_rand"
        d.mkdir()
        n_edges = {}
        for src_e, elabel, dst_e, n in (
                ("person", "knows", "person", 200),
                ("person", "likes", "post", 150),
                ("post", "hasTag", "tag", 120)):
            a = rng.integers(0, 40, size=n)
            b = rng.integers(0, 40, size=n)
            h2 = (f"{dst_e.capitalize()}.id.1" if src_e == dst_e
                  else f"{dst_e.capitalize()}.id")
            lines = [f"{src_e.capitalize()}.id|{h2}"]
            lines += [f"{x}|{y}" for x, y in zip(a, b)]
            (d / f"{src_e}_{elabel}_{dst_e}_0_0.csv").write_text(
                "\n".join(lines) + "\n")
            n_edges[elabel] = n
        edges = load_snb_edges(str(d))
        adj = snb_to_labeled_adjacency(edges).take_all()
        out_total = sum(r["degree"] for r in adj)
        in_total = sum(len(r["in_neighbors"]) for r in adj)
        assert out_total == sum(n_edges.values()) == in_total
        # per-label conservation: out tokens and in tokens count the same
        from collections import Counter
        oc: Counter = Counter()
        ic: Counter = Counter()
        for r in adj:
            oc.update(t.split(",")[0] for t in r["out_neighbors"])
            ic.update(t.split(",")[0] for t in r["in_neighbors"])
        assert oc == ic == Counter(n_edges)
        # every endpoint id appears exactly once as a vertex row
        verts = [r["vertex"] for r in adj]
        assert len(verts) == len(set(verts))
        ep = set()
        for r in edges.take_all():
            ep.add(r["src"]); ep.add(r["dst"])
        assert set(verts) == ep


class TestJsonlDocuments:
    def test_reads_canonical_shape_and_derives_n_chars(self, tmp_path):
        import json

        from sgp_sketch.sources import DOCUMENTS_SCHEMA, \
            read_documents_jsonl

        rows = [
            {"doc_id": 1, "text": "hello world", "source": "web",
             "lang": "en", "n_chars": 11, "extra": "dropped"},
            {"doc_id": 2, "text": "αβγ", "source": "web"},  # optionals absent
        ]
        p = tmp_path / "docs.jsonl"
        p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
        out = read_documents_jsonl(str(p))
        got = out.take_all()
        assert out.schema().names == DOCUMENTS_SCHEMA.names
        by_id = {r["doc_id"]: r for r in got}
        assert by_id[1]["n_chars"] == 11 and by_id[1]["lang"] == "en"
        # n_chars derived as CHARACTER count (matches len(text)), lang null
        assert by_id[2]["n_chars"] == 3 and by_id[2]["lang"] is None

    def test_gzip_jsonl_feeds_the_tokens_pipeline(self, tmp_path):
        import gzip
        import json

        from sgp_sketch.sources import read_documents_jsonl
        from sgp_sketch.tokenize import tokenize_documents_batch

        p = tmp_path / "docs.jsonl.gz"
        with gzip.open(p, "wt") as f:
            for i in range(5):
                f.write(json.dumps({"doc_id": i, "text": f"tok{i} b c",
                                    "source": "s"}) + "\n")
        toks = read_documents_jsonl(str(p)).map_batches(
            tokenize_documents_batch, batch_format="pyarrow").take_all()
        assert len(toks) == 5
        assert all(r["n_tok"] == 3 for r in toks)

    def test_missing_required_field_fails_loudly(self, tmp_path):
        import json

        from sgp_sketch.sources import read_documents_jsonl

        p = tmp_path / "bad.jsonl"
        p.write_text(json.dumps({"doc_id": 1, "text": "x"}) + "\n")
        with pytest.raises(Exception, match="source"):
            read_documents_jsonl(str(p)).take_all()

    def test_write_round_trips_and_drops_extras(self, tmp_path):
        import ray.data as rd

        from sgp_sketch.sources import DOCUMENTS_SCHEMA, \
            read_documents_jsonl, write_documents_jsonl

        rows = [{"doc_id": i, "text": f"doc {i} αβ", "lang": None,
                 "source": "web" if i % 2 else "book",
                 "n_chars": len(f"doc {i} αβ"),
                 "score": i * 0.5}  # extra pipeline column -> dropped
                for i in range(7)]
        out = tmp_path / "export"
        write_documents_jsonl(rd.from_items(rows), str(out))
        back = read_documents_jsonl(str(out))
        assert back.schema().names == DOCUMENTS_SCHEMA.names
        got = sorted(back.take_all(), key=lambda r: r["doc_id"])
        assert [r["doc_id"] for r in got] == list(range(7))
        for r, orig in zip(got, rows):
            assert r["text"] == orig["text"]
            assert r["source"] == orig["source"]
            assert r["n_chars"] == orig["n_chars"]
            assert "score" not in r

    def test_write_missing_required_column_fails_loudly(self, tmp_path):
        import ray.data as rd

        from sgp_sketch.sources import write_documents_jsonl

        ds = rd.from_items([{"doc_id": 1, "text": "x"}])
        with pytest.raises(Exception, match="source"):
            write_documents_jsonl(ds, str(tmp_path / "bad"))


def test_gzip_snap_edges_auto_detected(tmp_path):
    import gzip

    p = tmp_path / "edges.txt.gz"
    with gzip.open(p, "wt") as f:
        f.write("# c\n1 2\n2 3\n3 3\n")
    got = sorted((r["src"], r["dst"])
                 for r in read_snap_edges(str(p)).take_all())
    assert got == [("1", "2"), ("2", "3")]  # comment + self-loop dropped
