"""explainable_spatial_vqa_tpu — TPU-native framework for spatially grounded,
explainable compositional VQA on CLEVR / CLEVR-CoGenT.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
guoyu-zhang/explainable-spatial-vqa (reference mounted at /root/reference):

- ``core``      — typed data contracts: artifact schemas, vocabs, tokenizers,
                  program tree utilities, configuration system.
- ``clevr``     — symbolic CLEVR executor, bbox approximation, per-step
                  annotation generation (the offline ground-truth factory).
- ``vision``    — Flax ResNet-101 feature extractor (fused resize+normalize+
                  forward, batch-sharded).
- ``models``    — program generator (LSTM seq2seq w/ attention), program
                  executor (fusion transformer + routing + DETR-style box
                  decoder + token head), IQAP baseline families.
- ``ops``       — Pallas/XLA kernels: fused attention, greedy/beam decoding
                  with KV caches, Hungarian/Sinkhorn set matching, IoU/GIoU.
- ``parallel``  — jax.sharding mesh construction, data/model sharding rules.
- ``train``     — one trainer (pjit train step, optax, orbax checkpoints with
                  optimizer state + resume, early stopping) replacing the
                  reference's ~15 standalone scripts.
- ``infer``     — vectorized chained program execution with on-device caches,
                  batching program steps across questions by chain depth.
- ``evalsuite`` — answer accuracy by question type, program EM/token accuracy,
                  per-function P/R @ IoU 0.5, faithfulness quadrants, CoGenT.
"""

__version__ = "0.1.0"
