"""Analysis: similarity, clustering, comparisons, reports, parsing."""

from multimodal_embeddings_tpu.analysis.clustering import (
    cluster_pages,
    compute_similarity_matrix,
    group_regions_by_page,
)
from multimodal_embeddings_tpu.analysis.cross_compare import create_cross_comparison
from multimodal_embeddings_tpu.analysis.region_compare import (
    create_region_cross_comparison,
)
from multimodal_embeddings_tpu.analysis.demo_queries import run_demo_queries
from multimodal_embeddings_tpu.analysis.reports import create_cluster_report
