"""The Program Executor — thesis-final architecture (thesis §3.4.2, pp.16-22).

One call executes one program step: given cached image features, up to
``max_input_boxes`` input bounding boxes (outputs of dependency steps), and a
3-token text encoding ⟨function, arg1, arg2⟩, it routes to either a DETR-style
box decoder (spatial functions: emits up to ``num_queries`` boxes with
confidences) or a token classifier (non-spatial functions: emits one value
token).

Components:
- image encoder: 1x1 projection of (B, P, 1024) ResNet conv4 features to
  d_model + fixed 2D sine-cosine positional embedding (p.17),
- bbox encoder: 2-layer MLP on the 4 coords + the same 2D embedding evaluated
  at box centers; padded to ``max_input_boxes`` slots with mask (p.18),
- text encoder: token embedding + learned positional embedding over the 3
  slots, mask for absent args (p.18-19),
- fusion: [CLS | image | boxes | text] -> transformer encoder (3L, 4H, d=512)
  with key-padding mask (p.19),
- routing head: linear on the function-token slot -> {box, token} (p.19),
- box decoder: ``num_queries`` learned queries, 2 decoder layers, per-query
  2-layer MLP -> sigmoid (xmin, ymin, xmax, ymax, conf) (p.20),
- token head: linear classifier on CLS (p.20).

No checked-in reference script implements this exactly (SURVEY.md §2.2); the
closest prototypes are training2.py / training_bb_and_tokensv2-1_hungarian.py.
Built to the thesis specification.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from explainable_spatial_vqa_tpu.core.config import ExecutorConfig
from explainable_spatial_vqa_tpu.models.layers import (
    TransformerEncoder,
    DecoderBlock,
    posemb_2d_sincos,
    posemb_2d_sincos_at,
)

__all__ = ["ProgramExecutor", "ExecutorOutput", "roi_coverage_weights"]

ExecutorOutput = Dict[str, jnp.ndarray]


def roi_coverage_weights(boxes: jnp.ndarray, grid: int) -> jnp.ndarray:
    """Normalized box->patch coverage weights for ROI content pooling.

    ``boxes``: (..., 4) xyxy in [0, 1].  Returns (..., grid*grid) weights:
    the fraction of the box's area overlapping each grid cell (row-major
    r*grid+c token order, matching both the feature layout (C, H, W) and
    :func:`posemb_2d_sincos`), normalized to sum to 1 over cells.  A
    degenerate (zero-area) box — e.g. a padded slot — yields all-zero
    weights, so its pooled content is exactly zero.
    """
    edges = np.arange(grid + 1, dtype=np.float32) / grid
    lo = jnp.asarray(edges[:-1])  # (g,) cell lower bounds
    hi = jnp.asarray(edges[1:])  # (g,) cell upper bounds
    bx = boxes.astype(jnp.float32)
    ox = jnp.clip(
        jnp.minimum(bx[..., 2:3], hi) - jnp.maximum(bx[..., 0:1], lo), 0.0
    )  # (..., g) x-overlap per column
    oy = jnp.clip(
        jnp.minimum(bx[..., 3:4], hi) - jnp.maximum(bx[..., 1:2], lo), 0.0
    )  # (..., g) y-overlap per row
    cov = oy[..., :, None] * ox[..., None, :]  # (..., g, g) row-major
    cov = cov.reshape(cov.shape[:-2] + (grid * grid,))
    total = jnp.sum(cov, axis=-1, keepdims=True)
    return cov / jnp.maximum(total, 1e-9)


class BoxDecoder(nn.Module):
    """DETR-style set decoder: learned queries cross-attend to fused memory."""

    config: ExecutorConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        memory: jnp.ndarray,
        memory_mask: Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.config
        batch = memory.shape[0]
        queries = self.param(
            "queries",
            nn.initializers.normal(0.02),
            (cfg.num_queries, cfg.d_model),
        )
        x = jnp.broadcast_to(queries[None], (batch, cfg.num_queries, cfg.d_model)).astype(
            self.dtype
        )
        for i in range(cfg.box_decoder_layers):
            # Set prediction: no causal mask on query self-attention.
            block = DecoderBlock(
                cfg.d_model, cfg.num_heads, cfg.d_model * 4, cfg.dropout,
                dtype=self.dtype, name=f"block_{i}",
            )
            x = block(x, memory, None, memory_mask, deterministic)
        h = nn.Dense(cfg.d_model, dtype=self.dtype, name="head_hidden")(x)
        h = nn.relu(h)
        out = nn.Dense(5, dtype=jnp.float32, name="head_out")(h)
        return nn.sigmoid(out)  # (B, Q, 5): xyxy + confidence


class ProgramExecutor(nn.Module):
    config: ExecutorConfig
    dtype: Any = jnp.float32

    def setup(self) -> None:
        cfg = self.config
        self.image_proj = nn.Dense(cfg.d_model, dtype=self.dtype, name="image_proj")
        self.box_mlp_1 = nn.Dense(cfg.d_model, dtype=self.dtype, name="box_mlp_1")
        self.box_mlp_2 = nn.Dense(cfg.d_model, dtype=self.dtype, name="box_mlp_2")
        self.text_embed = nn.Embed(cfg.vocab_size, cfg.d_model, name="text_embed")
        self.text_pos = self.param(
            "text_pos", nn.initializers.normal(0.02), (cfg.num_text_tokens, cfg.d_model)
        )
        self.cls_token = self.param(
            "cls", nn.initializers.normal(0.02), (1, 1, cfg.d_model)
        )
        self.fusion = TransformerEncoder(
            cfg.encoder_layers, cfg.d_model, cfg.num_heads, cfg.d_model * 4,
            cfg.dropout, dtype=self.dtype, remat=cfg.remat, name="fusion",
        )
        if cfg.roi_sim and not cfg.box_roi:
            raise ValueError("roi_sim requires box_roi (it reuses the pooled ROI content)")
        if cfg.roi_sim and cfg.d_model % cfg.roi_sim_heads != 0:
            raise ValueError(
                f"roi_sim_heads={cfg.roi_sim_heads} must divide "
                f"d_model={cfg.d_model}")
        if cfg.box_roi:
            self.roi_proj = nn.Dense(cfg.d_model, dtype=self.dtype, name="roi_proj")
        if cfg.count_embed:
            # Zero-init: the count channel is an exact no-op at init.  Indexed
            # by the number of unmasked input-box slots (0..max_input_boxes) —
            # well-defined in BOTH regimes: GT set size during training,
            # thresholded confident boxes during chained inference.
            self.count_embedder = nn.Embed(
                cfg.max_input_boxes + 1, cfg.d_model,
                embedding_init=nn.initializers.zeros, name="count_embed",
            )
        if cfg.roi_sim:
            self.sim_roi_proj = nn.Dense(cfg.d_model, dtype=self.dtype, name="sim_roi_proj")
            self.sim_img_proj = nn.Dense(cfg.d_model, dtype=self.dtype, name="sim_img_proj")
            # Zero-init: the similarity channel is an exact no-op at init, so
            # turning roi_sim on cannot hurt the early optimization.
            self.sim_embed = nn.Dense(
                cfg.d_model, dtype=self.dtype, name="sim_embed",
                kernel_init=nn.initializers.zeros,
            )
        self.routing_head = nn.Dense(2, dtype=jnp.float32, name="routing_head")
        self.token_head = nn.Dense(cfg.token_classes, dtype=jnp.float32, name="token_head")
        self.box_decoder = BoxDecoder(cfg, dtype=self.dtype, name="box_decoder")
        grid = int(round(float(np.sqrt(cfg.num_image_tokens))))
        assert grid * grid == cfg.num_image_tokens, "image tokens must form a square grid"
        self._image_pos = posemb_2d_sincos(grid, grid, cfg.d_model)

    def precompute_image(self, image_tokens: jnp.ndarray) -> jnp.ndarray:
        """Project raw (B, P, 1024) features to positioned d_model tokens.

        Chained inference calls this ONCE per question and reuses the result
        for every program step (the thesis §3.4.2 p.16 image-feature cache;
        the checked-in reference re-encodes the image every step,
        inference_transformer_full_annotation_new.py:128-135).

        With roi_sim on, the similarity channel's image-side keys
        ``sim_img_proj(img)`` depend ONLY on these positioned tokens, so they
        are computed here once per question and carried along the feature dim
        — return shape (B, P, 2*d_model), split by :meth:`encode`.  This
        removes the ~5% per-step FLOP waste of re-projecting the cached
        tokens inside every chain step (docs/DESIGN.md §12), with zero extra
        plumbing through the chain runners (one threaded array either way).
        """
        img = self.image_proj(image_tokens.astype(self.dtype))
        img = img + jnp.asarray(self._image_pos, self.dtype)[None]
        if self.config.roi_sim:
            return jnp.concatenate([img, self.sim_img_proj(img)], axis=-1)
        return img

    def encode(
        self,
        image_tokens: jnp.ndarray,
        input_boxes: jnp.ndarray,
        box_mask: jnp.ndarray,
        text_tokens: jnp.ndarray,
        text_mask: jnp.ndarray,
        deterministic: bool = True,
        image_precomputed: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Fuse modalities.

        image_tokens: (B, P, 1024) raw features, or (B, P, d_model) when
        ``image_precomputed`` (from :meth:`precompute_image`); input_boxes:
        (B, S, 4); box_mask: (B, S) bool; text_tokens: (B, 3) int; text_mask:
        (B, 3) bool.  Returns {"memory": (B, 1+P+S+3, d), "key_mask":
        (B,1,1,L), "cls": (B, d), "func_slot": (B, d)}.
        """
        cfg = self.config
        batch = image_tokens.shape[0]

        sim_keys = None
        if image_precomputed:
            img = image_tokens.astype(self.dtype)
            if cfg.roi_sim:
                # per-question cache carries [tokens | sim keys] along the
                # feature dim (precompute_image) — split, don't re-project
                img, sim_keys = (img[..., : cfg.d_model],
                                 img[..., cfg.d_model :])
        else:
            img = self.image_proj(image_tokens.astype(self.dtype))
            img = img + jnp.asarray(self._image_pos, self.dtype)[None]
            if cfg.roi_sim:
                sim_keys = self.sim_img_proj(img)

        centers = jnp.stack(
            [
                (input_boxes[..., 0] + input_boxes[..., 2]) * 0.5,
                (input_boxes[..., 1] + input_boxes[..., 3]) * 0.5,
            ],
            axis=-1,
        )
        box = self.box_mlp_2(nn.relu(self.box_mlp_1(input_boxes.astype(self.dtype))))
        box = box + posemb_2d_sincos_at(centers, cfg.d_model).astype(self.dtype)
        if cfg.box_roi:
            # Inject the image content under each dependency box directly
            # (coverage-weighted patch average) so attribute-at-box readout
            # does not have to learn positional binding from scratch.  Runs
            # on the positioned image tokens, so it is identical in the
            # precomputed (chained-inference cache) and raw paths.
            grid = int(round(float(np.sqrt(cfg.num_image_tokens))))
            weights = roi_coverage_weights(input_boxes, grid).astype(self.dtype)
            pooled = jnp.einsum("bsp,bpd->bsd", weights, img)
            box = box + self.roi_proj(pooled)
            if cfg.roi_sim:
                # Content-similarity channel: mark, for every image token, how
                # strongly its content matches each dependency box's pooled ROI
                # content (learned bilinear form).  same_*/relate need exactly
                # this "all patches like the input box" map; positional
                # cross-attention learns it slowly from ~1/7 of corpus steps.
                # Per-slot sims are kept separate (B, P, S) so the model can
                # tell WHICH dependency matched; invalid slots are zeroed.
                # With roi_sim_heads=K>1, the projected dims split into K
                # independent match maps — same_color needs a color-subspace
                # match, same_shape a shape-subspace one; K heads give the
                # fusion a basis to select from per function.  K=1 is exactly
                # the original single-map channel.
                heads = cfg.roi_sim_heads
                dh = cfg.d_model // heads
                q = self.sim_roi_proj(pooled)  # (B, S, d)
                k = sim_keys  # (B, P, d) — cached per question when
                # image_precomputed (see precompute_image), else fresh above
                q = q.reshape(q.shape[:-1] + (heads, dh))
                k = k.reshape(k.shape[:-1] + (heads, dh))
                sim = jnp.einsum("bshd,bphd->bpsh", q, k) / jnp.sqrt(
                    jnp.asarray(dh, self.dtype))
                sim = sim * box_mask.astype(self.dtype)[:, None, :, None]
                sim = sim.reshape(sim.shape[:2] + (-1,))  # (B, P, S*K)
                img = img + self.sim_embed(sim)

        text = self.text_embed(text_tokens).astype(self.dtype)
        text = text + self.text_pos[None].astype(self.dtype)

        cls = jnp.broadcast_to(self.cls_token, (batch, 1, cfg.d_model)).astype(self.dtype)
        if cfg.count_embed:
            # CLS carries the input-set size explicitly so count/exist don't
            # have to count set members through attention pooling.  Depends
            # on the MASK only (never box contents), so padded-slot
            # invariance is preserved by construction.
            k = jnp.sum(box_mask.astype(jnp.int32), axis=1)
            cls = cls + self.count_embedder(k)[:, None, :].astype(self.dtype)
        x = jnp.concatenate([cls, img, box, text], axis=1)

        valid = jnp.concatenate(
            [
                jnp.ones((batch, 1 + img.shape[1]), dtype=bool),
                box_mask.astype(bool),
                text_mask.astype(bool),
            ],
            axis=1,
        )
        key_mask = valid[:, None, None, :]
        memory = self.fusion(x, key_mask, deterministic)

        func_slot_index = 1 + img.shape[1] + box.shape[1]  # first text token
        return {
            "memory": memory,
            "key_mask": key_mask,
            "cls": memory[:, 0],
            "func_slot": memory[:, func_slot_index],
        }

    def __call__(
        self,
        image_tokens: jnp.ndarray,
        input_boxes: jnp.ndarray,
        box_mask: jnp.ndarray,
        text_tokens: jnp.ndarray,
        text_mask: jnp.ndarray,
        deterministic: bool = True,
        image_precomputed: bool = False,
    ) -> ExecutorOutput:
        fused = self.encode(
            image_tokens, input_boxes, box_mask, text_tokens, text_mask,
            deterministic, image_precomputed,
        )
        routing_logits = self.routing_head(fused["func_slot"].astype(jnp.float32))
        token_logits = self.token_head(fused["cls"].astype(jnp.float32))
        boxes = self.box_decoder(fused["memory"], fused["key_mask"], deterministic)
        return {
            "routing_logits": routing_logits,  # (B, 2): 0=box branch, 1=token branch
            "token_logits": token_logits,  # (B, token_classes)
            "pred_boxes": boxes[..., :4],  # (B, Q, 4) in [0,1]
            "pred_conf": boxes[..., 4],  # (B, Q) in [0,1]
        }
