"""Parity gates for the bf16-IO/fp32-accum serving precision (ops.lowp).

VERDICT r2 'prove or break the serving ceiling': before bench.py may enable
lowp LN/softmax, the executor's outputs must stay within the documented
tolerance of the fp32-IO path, and every DECISIVE decision (routing branch,
argmax token, thresholded boxes — wherever the fp32 margin exceeds twice the
numeric tolerance) must be identical.  Near-ties can legitimately flip under
ANY rounding change (including a different fp32 op order), so decision
equality is margin-gated here.  (Measurement kept lowp OFF in serving —
docs/DESIGN.md §10 records it as a negative result — so these gates guard
a dormant opt-in, not a shipped configuration.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from explainable_spatial_vqa_tpu.core.config import ExecutorConfig
from explainable_spatial_vqa_tpu.models.executor import ProgramExecutor
from explainable_spatial_vqa_tpu.ops import lowp

ATOL = 2.5e-2  # measured max |delta| at random init is ~1.9e-2 (3 LN blocks
# of bf16-IO rounding at 2^-8 relative); trained-model answer parity is the
# demo-protocol gate


@pytest.fixture(autouse=True)
def _reset_lowp():
    yield
    lowp.use_lowp_serving(False)
    jax.clear_caches()


def _executor_outputs():
    cfg = ExecutorConfig(vocab_size=32, token_classes=16)
    model = ProgramExecutor(cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    b = 8
    img = jnp.asarray(rng.rand(b, cfg.num_image_tokens, cfg.image_feature_dim), jnp.float32)
    boxes = jnp.asarray(rng.rand(b, cfg.max_input_boxes, 4), jnp.float32)
    bmask = jnp.asarray(rng.rand(b, cfg.max_input_boxes) < 0.6)
    text = jnp.asarray(rng.randint(1, 32, (b, 3)), jnp.int32)
    tmask = jnp.ones((b, 3), bool)
    variables = model.init(jax.random.PRNGKey(0), img, boxes, bmask, text, tmask)
    out = model.apply(variables, img, boxes, bmask, text, tmask)
    return cfg, {k: np.asarray(v, np.float32) for k, v in out.items()}


def _margin(logits):
    """Gap between the top-2 entries along the last axis."""
    part = np.sort(logits, axis=-1)
    return part[..., -1] - part[..., -2]


def test_lowp_serving_matches_fp32_io():
    jax.clear_caches()
    _, base = _executor_outputs()
    lowp.use_lowp_serving(True)
    jax.clear_caches()
    _, low = _executor_outputs()

    np.testing.assert_allclose(low["routing_logits"], base["routing_logits"], atol=ATOL)
    np.testing.assert_allclose(low["token_logits"], base["token_logits"], atol=ATOL)
    np.testing.assert_allclose(low["pred_boxes"], base["pred_boxes"], atol=1e-2)
    np.testing.assert_allclose(low["pred_conf"], base["pred_conf"], atol=1e-2)

    # margin-gated decision equality: wherever fp32 is decisive (top-2 gap
    # > 2*ATOL), lowp must pick the same branch/token/box set
    decisive = _margin(base["routing_logits"]) > 2 * ATOL
    np.testing.assert_array_equal(
        np.argmax(low["routing_logits"], -1)[decisive],
        np.argmax(base["routing_logits"], -1)[decisive],
    )
    assert decisive.any()
    decisive = _margin(base["token_logits"]) > 2 * ATOL
    np.testing.assert_array_equal(
        np.argmax(low["token_logits"], -1)[decisive],
        np.argmax(base["token_logits"], -1)[decisive],
    )
    decisive = np.abs(base["pred_conf"] - 0.5) > 2e-2
    np.testing.assert_array_equal(
        (low["pred_conf"] >= 0.5)[decisive], (base["pred_conf"] >= 0.5)[decisive]
    )


def test_lowp_components_individually_small():
    """Each lowp segment alone stays within the combined tolerance."""
    jax.clear_caches()
    _, base = _executor_outputs()
    for setter in (lowp.use_lowp_norms, lowp.use_lowp_softmax):
        lowp.use_lowp_serving(False)
        setter(True)
        jax.clear_caches()
        _, low = _executor_outputs()
        np.testing.assert_allclose(
            low["token_logits"], base["token_logits"], atol=ATOL,
            err_msg=setter.__name__,
        )


def test_lowp_off_is_bitwise_default():
    """With flags off, outputs are bit-identical to a fresh default run."""
    jax.clear_caches()
    _, a = _executor_outputs()
    lowp.use_lowp_serving(True)
    lowp.use_lowp_serving(False)
    jax.clear_caches()
    _, b = _executor_outputs()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_norm_dtype_resolution():
    assert lowp.norm_dtype(jnp.bfloat16) == jnp.float32
    assert lowp.norm_dtype(jnp.float32) == jnp.float32
    lowp.use_lowp_norms(True)
    assert lowp.norm_dtype(jnp.bfloat16) == jnp.bfloat16
    # fp32 compute keeps fp32 norms even with the flag on
    assert lowp.norm_dtype(jnp.float32) == jnp.float32
