"""fast_carpenter_ray — a Ray-Data-native data-processing engine.

A from-scratch re-expression of FAST-HEP/fast-carpenter's declarative
stage-pipeline model (Define -> selection/cut-flow -> BinnedDataframe
summaries; cf. reference ``fast_carpenter/__init__.py:21-23``) as a streaming
chain of ``ray.data.Dataset.map_batches`` stages over zero-copy Arrow
batches, extended with the spatial-join + tiling operators mandated by the
project north star (cell encode, point-in-polygon join, kNN join, zonal
tiling) and large-scale training-data operators (dedup, similarity search,
text analysis, multimodal plumbing).

Design rules (see SURVEY.md §4.2):
  * every per-record transform is a vectorized ``map_batches`` stage
    (``batch_format="pyarrow"`` by default);
  * stages that hold loaded-once state (polygon index, site index, models)
    are callable classes run as actor pools;
  * all cross-row reductions are emitted as data and combined with
    ``groupby().aggregate()`` (associative + commutative merges, mirroring
    the reference's ``merge()`` contract);
  * nothing materializes the full dataset mid-pipeline.
"""

from .version import __version__  # noqa: F401

#: Stage classes usable in YAML processing configs, mirroring the
#: reference's ``known_stages`` registry (fast_carpenter/__init__.py:21-23).
known_stages = [
    "Define",
    "SystematicWeights",
    "CutFlow",
    "SelectPhaseSpace",
    "BinnedDataframe",
    "EventByEventDataframe",
    "ExtractText",
    "HashCompare",
    "CellEncode",
    "PIPJoin",
    "KNNJoin",
    "ZonalAggregate",
    "ExactDedup",
    "MinHashDedup",
    "SimHashDedup",
    "TokenCount",
    "QualityScore",
    "LangId",
    "Fingerprint",
]
