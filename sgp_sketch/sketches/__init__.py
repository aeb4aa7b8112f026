from .base import Sketch, SKETCH_REGISTRY, sketch_from_bytes, register_sketch
from .hll import HyperLogLog
from .cms import CountMinSketch
from .bloom import BlockedBloomFilter
from .kll import KLLSketch
from .tdigest import TDigest
from .stats import StatsAccumulator
from .kmv import KMVSketch

__all__ = [
    "Sketch",
    "SKETCH_REGISTRY",
    "sketch_from_bytes",
    "register_sketch",
    "HyperLogLog",
    "CountMinSketch",
    "BlockedBloomFilter",
    "KLLSketch",
    "TDigest",
    "StatsAccumulator",
    "KMVSketch",
]
