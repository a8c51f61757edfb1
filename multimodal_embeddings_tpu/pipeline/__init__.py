"""Pipeline: stage functions, processors, fused serving path."""

from multimodal_embeddings_tpu.pipeline.fused import (
    build_fused_batch_fn,
    build_fused_page_fn,
)
from multimodal_embeddings_tpu.pipeline.stages import (
    run_columns_stage,
    run_combine_stage,
    run_edge_filter_stage,
    run_median_stage,
)
