from .define import Alias, Define, SystematicWeights  # noqa: F401
from .selection import CutFlow, SelectPhaseSpace, build_selection  # noqa: F401
from .binned_dataframe import BinnedDataframe  # noqa: F401
from .skim import EventByEventDataframe  # noqa: F401
from .extract import ExtractText, HashCompare, extract_one, sha256_hex  # noqa: F401
from .cell_encode import CellEncode  # noqa: F401
from .pip_join import PIPJoiner, pip_join  # noqa: F401
from .knn_join import KNNJoiner, knn_join, brute_force_knn  # noqa: F401
from .zonal import ZonalAggregate  # noqa: F401
from .dedup import ExactDedup, MinHashDedup, SimHashDedup, ngram_jaccard  # noqa: F401
from .text import TokenCount, QualityScore, LangId, Fingerprint, TextClean  # noqa: F401
from .ann import ann_topk, ivf_topk, near_dup_cosine, LSHBuckets  # noqa: F401
from .asof_join import asof_join  # noqa: F401
from .windows import session_windows, ewma  # noqa: F401
from .multimodal import (ImageDecode, FrameSample, AudioResample,  # noqa: F401
                         media_schema, decode_ppm, decode_bmp, decode_wav)
from .boilerplate import strip_boilerplate, frequent_lines  # noqa: F401
from .winnow import winnow_fingerprints  # noqa: F401
from .joins import lookup_join, hash_join  # noqa: F401
from .range_join import range_join, range_join_bucketed  # noqa: F401
from .raster import WorldRaster, raster_sample, raster_zonal, make_test_raster  # noqa: F401
from .sample import hash_sample, group_topk  # noqa: F401
from .text import vocab_count, doc_frequency  # noqa: F401
from .profile import profile_columns  # noqa: F401
from .urls import ParseURL, BlocklistFilter, CanonicalizeURL  # noqa: F401
from .crawl import RobotsRules  # noqa: F401
from .compact_cells import compact_cells, uncompact_cells, tile_pyramid  # noqa: F401
from .cluster import cluster_cells  # noqa: F401
from .hotspot import hotspot_cells  # noqa: F401
from .spacetime import spacetime_cube, outlier_cells  # noqa: F401
from .retention import (retention, cohort_retention, od_matrix,  # noqa: F401
                        od_matrix_bucketed, audience_overlap)
from .linkgraph import extract_links, domain_degrees, pagerank  # noqa: F401
from .stats import grouped_corr, grouped_entropy, grouped_mode, zipf_slope  # noqa: F401
from .skyline import skyline  # noqa: F401
from .index import inverted_index  # noqa: F401
from .diff import dataset_diff, latest_by_key  # noqa: F401
from .redirects import resolve_map, resolve_stream, resolve_redirects  # noqa: F401
from .kmeans import kmeans, kmeans_assign  # noqa: F401
from .simjoin import similarity_join  # noqa: F401
from .linkgraph import count_triangles  # noqa: F401
from .stats import grouped_collect_set, pivot_counts  # noqa: F401
from .rollup import rollup, cube  # noqa: F401
