"""ResNet feature extractor: shapes, torch numeric parity, pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from explainable_spatial_vqa_tpu.vision.resnet import (
    Bottleneck,
    ResNetFeatures,
    params_from_torch_state_dict,
)


def test_feature_shape_small():
    model = ResNetFeatures(num_stages=3, stage_sizes=(1, 1, 1))
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    # 64 -> conv/2 32 -> pool/2 16 -> stage2 /2 8 -> stage3 /2 4; C = 1024
    assert out.shape == (2, 4, 4, 1024)


def test_resnet101_stage_structure():
    model = ResNetFeatures()
    x = jnp.zeros((1, 224, 224, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    params = variables["params"]
    assert sum(1 for k in params if k.startswith("layer1_")) == 3
    assert sum(1 for k in params if k.startswith("layer2_")) == 4
    assert sum(1 for k in params if k.startswith("layer3_")) == 23


@pytest.mark.slow
def test_resnet101_output_shape_224():
    model = ResNetFeatures()
    x = jnp.zeros((1, 224, 224, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(variables, x)
    assert out.shape == (1, 14, 14, 1024)  # reference artifact (1024, 14, 14)


def test_bottleneck_matches_torch():
    """Numeric parity of one bottleneck block against a hand-built torch
    equivalent with identical weights (validates conv layout, BN math, and
    padding conventions for the state-dict converter)."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)

    cin, mid, cout, stride = 8, 4, 16, 2
    conv1 = torch.nn.Conv2d(cin, mid, 1, bias=False)
    bn1 = torch.nn.BatchNorm2d(mid).eval()
    conv2 = torch.nn.Conv2d(mid, mid, 3, stride=stride, padding=1, bias=False)
    bn2 = torch.nn.BatchNorm2d(mid).eval()
    conv3 = torch.nn.Conv2d(mid, cout, 1, bias=False)
    bn3 = torch.nn.BatchNorm2d(cout).eval()
    dconv = torch.nn.Conv2d(cin, cout, 1, stride=stride, bias=False)
    dbn = torch.nn.BatchNorm2d(cout).eval()
    # randomize BN stats so the affine fold is non-trivial
    for bn in (bn1, bn2, bn3, dbn):
        bn.running_mean.data = torch.randn_like(bn.running_mean) * 0.1
        bn.running_var.data = torch.rand_like(bn.running_var) + 0.5
        bn.weight.data = torch.randn_like(bn.weight) * 0.2 + 1.0
        bn.bias.data = torch.randn_like(bn.bias) * 0.1

    x = torch.randn(2, cin, 10, 10)
    with torch.no_grad():
        h = torch.relu(bn1(conv1(x)))
        h = torch.relu(bn2(conv2(h)))
        h = bn3(conv3(h))
        ref = torch.relu(h + dbn(dconv(x))).numpy()

    state_dict = {
        "layer1.0.conv1.weight": conv1.weight,
        "layer1.0.bn1.weight": bn1.weight, "layer1.0.bn1.bias": bn1.bias,
        "layer1.0.bn1.running_mean": bn1.running_mean,
        "layer1.0.bn1.running_var": bn1.running_var,
        "layer1.0.conv2.weight": conv2.weight,
        "layer1.0.bn2.weight": bn2.weight, "layer1.0.bn2.bias": bn2.bias,
        "layer1.0.bn2.running_mean": bn2.running_mean,
        "layer1.0.bn2.running_var": bn2.running_var,
        "layer1.0.conv3.weight": conv3.weight,
        "layer1.0.bn3.weight": bn3.weight, "layer1.0.bn3.bias": bn3.bias,
        "layer1.0.bn3.running_mean": bn3.running_mean,
        "layer1.0.bn3.running_var": bn3.running_var,
        "layer1.0.downsample.0.weight": dconv.weight,
        "layer1.0.downsample.1.weight": dbn.weight,
        "layer1.0.downsample.1.bias": dbn.bias,
        "layer1.0.downsample.1.running_mean": dbn.running_mean,
        "layer1.0.downsample.1.running_var": dbn.running_var,
    }
    converted = params_from_torch_state_dict(state_dict, num_stages=1)
    block_params = converted["params"]["layer1_block0"]

    block = Bottleneck(mid=mid, out=cout, stride=stride, downsample=True)
    x_jax = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))  # NCHW -> NHWC
    out = block.apply({"params": block_params}, x_jax)
    out_nchw = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out_nchw, ref, atol=2e-5)


def test_extract_pipeline(tmp_path):
    from PIL import Image

    from explainable_spatial_vqa_tpu.core.artifacts import read_features
    from explainable_spatial_vqa_tpu.vision.extract import (
        collect_image_paths,
        extract_features,
    )

    rng = np.random.RandomState(0)
    for i in range(3):
        arr = rng.randint(0, 255, (20, 30, 3), np.uint8)
        Image.fromarray(arr).save(tmp_path / f"CLEVR_val_{i:06d}.png")
    paths = collect_image_paths(str(tmp_path))
    assert len(paths) == 3

    model = ResNetFeatures(num_stages=3, stage_sizes=(1, 1, 1))
    out_h5 = str(tmp_path / "features.h5")
    extract_features(paths, out_h5, model=model, batch_size=2, size=(32, 32))
    feats = read_features(out_h5)
    assert feats.shape == (3, 1024, 2, 2)
    assert feats.dtype == np.float32
    assert np.isfinite(feats).all()
