"""Relational + LLM-data-pipeline operators as DataFrame compositions.

Public surface (each name re-exported from its module; see the module
docstrings for scale design notes):

  dedup       exact_duplicates normalized_duplicates minhash_signatures
              lsh_candidate_pairs jaccard_pairs simhash_bits
              connected_components connected_components_star
  similarity  brute_force_topk lsh_bucketed_topk ivf_assign
              label_centroids kmeans_lloyd
  sampling    (deterministic hash sampling / splits / caps — see module)
  multimodal  attach_payload extract_features resize_media sample_frames
  skew        with_salt salted_agg salted_join
  ranking     global_row_number exact_ntile (distributed exact rank —
              zero single-partition windows)
"""

from postrack_spark.operators.dedup import (
    connected_components,
    connected_components_star,
    exact_duplicates,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    normalized_duplicates,
    simhash_bits,
)
from postrack_spark.operators.ranking import exact_ntile, global_row_number
from postrack_spark.operators.multimodal import (
    attach_payload,
    extract_features,
    resize_media,
    sample_frames,
)
from postrack_spark.operators.similarity import (
    brute_force_topk,
    ivf_assign,
    kmeans_lloyd,
    label_centroids,
    lsh_bucketed_topk,
)
from postrack_spark.operators.skew import salted_agg, salted_join, with_salt

__all__ = [
    "exact_duplicates",
    "normalized_duplicates",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "jaccard_pairs",
    "simhash_bits",
    "connected_components",
    "connected_components_star",
    "brute_force_topk",
    "lsh_bucketed_topk",
    "ivf_assign",
    "label_centroids",
    "kmeans_lloyd",
    "attach_payload",
    "extract_features",
    "resize_media",
    "sample_frames",
    "with_salt",
    "salted_agg",
    "salted_join",
    "global_row_number",
    "exact_ntile",
]
