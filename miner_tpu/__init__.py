"""miner_tpu — a TPU-native news-recommendation framework.

A ground-up JAX / XLA / Pallas / pjit re-design of the MINER family of
news-recommendation models (reference: MrRobot2211/miner): a PLM news encoder
feeding poly-attention multi-interest user modelling (Miner), a Fastformer
additive-attention user encoder, an UnBERT-style single-tower cross-encoder,
and a UniSRec sequential recommender with a MoE adaptor — plus contrastive
news-encoder pretraining, MIND-format data pipelines, impression-grouped
ranking metrics, and a sharded news-embedding cache for multi-host TPU slices.

Design principles (differ deliberately from the reference):
  * The news corpus is tokenized once into fixed-shape int32 tables that live
    in device memory (optionally row-sharded across the mesh); training
    batches carry only indices, so the host->device boundary moves a few KB
    per step instead of re-packing token tensors per sample.
  * All shapes are static; samplers emit fixed (B, C)/(B, H) index arrays.
  * Parallelism is expressed with `jax.sharding.Mesh` + NamedSharding; XLA
    inserts the collectives.
  * Hot non-matmul ops (poly-attention, Fastformer additive attention,
    table lookup+score) have fused Pallas TPU kernels with XLA reference
    implementations and equivalence tests.
"""

__version__ = "0.1.0"
