"""sgp_sketch — a Ray-Data-native distributed sketch / streaming-partitioning engine.

Built from scratch against the capabilities of the reference testbed
(anilpacaci/streaming-graph-partitioning, SIGMOD'19): greedy streaming
balance-vs-locality partition assignment (hash/LDG/Fennel semantics of
``EdgeCutSGP.java``), mergeable accumulator state, skew-aware shuffle, and
throughput/imbalance metrics — re-expressed as mergeable sketch UDAFs
(HyperLogLog, count-min, t-digest, KLL, blocked Bloom) over Parquet tables of
pre-tokenized training sequences, executed as ``ray.data.Dataset`` pipelines
(``map_batches`` over zero-copy Arrow batches, actor pools for stateful
stages, groupby-aggregate merge shuffles).

Nothing in here is a port: the reference is single-JVM line-at-a-time Java;
this library is columnar, vectorized and distributed by construction.
"""

__version__ = "0.1.0"

from .pipeline import SketchSpec, SketchResult, build_sketches, plan_partitions  # noqa: E402,F401
from .checkpoint import run_checkpointed  # noqa: E402,F401
from .schema import tokens_dataset, generate_tokens_parquet  # noqa: E402,F401
from .partition import (  # noqa: E402,F401
    HDRFEdgePartitioner,
    StreamingPartitioner,
    assign_sources_greedy,
    assign_sources_salted,
    stable_hash_partition,
)
from .ops import (  # noqa: E402,F401
    asof_join,
    epoch_shuffle,
    interval_join,
    pack_sequences,
    source_quota_sample,
    source_repeat,
)
from .analytics import (  # noqa: E402,F401
    bfs_layers,
    bfs_layers_rescan,
    bfs_partition_pruned,
    connected_components,
    label_edges,
    pagerank,
    sssp_distances,
    two_hop_cross_partition,
)
from .partition import offline_multilevel_partition  # noqa: E402,F401
from .ops import split_by_partition  # noqa: E402,F401
from .vertexstate import ShardedGraph  # noqa: E402,F401
from .ann import ann_query_table_topk  # noqa: E402,F401
from .sources import read_documents_jsonl, write_documents_jsonl  # noqa: E402,F401
from .multimodal import frame_sample, image_resize, media_features  # noqa: E402,F401
