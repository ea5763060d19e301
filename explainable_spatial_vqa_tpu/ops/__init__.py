"""Compute kernels: attention (XLA + Pallas), set matching, IoU geometry,
autoregressive decoding with KV caches."""
