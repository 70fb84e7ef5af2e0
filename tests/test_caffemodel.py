import numpy as np
import jax

from smallhardface_tpu.io import caffemodel, protowire as pw
from smallhardface_tpu.models import detector


def test_wire_varint_roundtrip():
    for v in [0, 1, 127, 128, 300, 2 ** 32, 2 ** 60]:
        raw = pw.write_varint(v)
        got, pos = pw.read_varint(memoryview(raw), 0)
        assert got == v and pos == len(raw)


def test_caffemodel_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    layers = {
        "conv1_1": [rng.randn(64, 3, 3, 3).astype(np.float32),
                    rng.randn(64).astype(np.float32)],
        "fc_like": [rng.randn(10, 20, 1, 1).astype(np.float32)],
    }
    path = tmp_path / "model.caffemodel"
    caffemodel.write_caffemodel(path, layers)
    back = caffemodel.read_caffemodel(path)
    assert set(back) == set(layers)
    for name in layers:
        for a, b in zip(layers[name], back[name]):
            np.testing.assert_array_equal(a, b)


def test_export_load_roundtrip(tmp_path):
    """Full detector pytree -> .caffemodel -> pytree round trip, including
    the structurally shared head and the bilinear deconv kernel."""
    spec = detector.ModelSpec(different_dilation=True)
    params = detector.init_params(jax.random.PRNGKey(0), spec)
    path = tmp_path / "final.caffemodel"
    caffemodel.export_params(path, params)

    raw = caffemodel.read_caffemodel(path)
    # the shared head is materialized once per dilated conv, as Caffe does
    assert {"head_1", "head_2", "head_4"} <= set(raw)
    np.testing.assert_array_equal(raw["head_1"][0], raw["head_4"][0])

    spec2 = detector.ModelSpec(different_dilation=True)
    fresh = detector.init_params(jax.random.PRNGKey(1), spec2)
    loaded = caffemodel.load_into_params(path, fresh, strict=True)
    for name, leaf in params.items():
        for k, v in leaf.items():
            np.testing.assert_allclose(
                np.asarray(loaded[name][k]), np.asarray(v), rtol=1e-6,
                err_msg=f"{name}/{k}")


def test_load_partial_backbone(tmp_path):
    """Loading a VGG-only caffemodel (the ImageNet init path,
    /root/reference/lib/train.py:49) leaves head params at init."""
    spec = detector.ModelSpec(different_dilation=True)
    src = detector.init_params(jax.random.PRNGKey(2), spec)
    vgg_only = {
        name: [np.asarray(leaf["w"]).transpose(3, 2, 0, 1),
               np.asarray(leaf["b"])]
        for name, leaf in src.items()
        if name.startswith(("conv1_", "conv2_", "conv3_", "conv4_", "conv5_"))
        and name not in ("conv5_256", "conv4_256", "conv5_256_up")
    }
    path = tmp_path / "vgg.caffemodel"
    caffemodel.write_caffemodel(path, vgg_only)

    fresh = detector.init_params(jax.random.PRNGKey(3), spec)
    loaded = caffemodel.load_into_params(path, fresh)
    np.testing.assert_allclose(np.asarray(loaded["conv3_1"]["w"]),
                               np.asarray(src["conv3_1"]["w"]), rtol=1e-6)
    # untouched: head stays at fresh init
    np.testing.assert_array_equal(np.asarray(loaded["head"]["w"]),
                                  np.asarray(fresh["head"]["w"]))
