"""multimodal_embeddings_tpu — a TPU-native newspaper-page understanding framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the
``calhounpaul/multimodal_embeddings`` reference pipeline:

* orientation / deskew correction (Hough-vote skew on TPU),
* DocLayout-YOLO-style 10-class layout detection with multi-grid tiling,
* edge-box filtering, cross-grid NMS merging,
* median text-width extraction and column-center detection,
* per-region multimodal embedding extraction (batched, mesh-sharded),
* an embedding store with filtered cosine top-k retrieval,
* cross-page / cross-region similarity reports,
* region-area-weighted hierarchical clustering.

Layout
------
``core``      device mesh / dtype policy / PRNG
``ops``       geometry + image compute ops (exact host path & jitted TPU path)
``kernels``   Pallas TPU kernels (flash attention, fused top-k, tiled IoU)
``models``    Flax models: DocLayout-YOLO detector, vision/text encoders, mmE5
``parallel``  sharding rules and collectives
``store``     persistent embedding store with cosine top-k retrieval
``analysis``  similarity, clustering, reporting
``io``        JSON schemas, image IO, progress/resume, logging
``pipeline``  stage graph + single-process runner
``training``  contrastive training step (dp/fsdp/tp sharded)
``cli``       per-stage command line entry points mirroring the reference
"""

__version__ = "0.1.0"
