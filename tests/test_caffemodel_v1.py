"""Legacy-V1 `.caffemodel` reading against a fixture the repo's writer
CANNOT produce.

The public VGG16 ImageNet caffemodel (scripts/download_imgnet_model.sh)
uses the deprecated V1 format: NetParameter.layers=2 (V1LayerParameter
with name=4, type=5 enum, blobs=6) and BlobProto legacy 4-D dims
(num=1, channels=2, height=3, width=4) instead of a shape message
(/root/reference/caffe/src/caffe/proto/caffe.proto:10-22,95,1247-1296;
upgrade path caffe/src/caffe/util/upgrade_proto.cpp).  Every other
caffemodel test round-trips through io.caffemodel.write_caffemodel, which
emits only the new format — these tests hand-assemble V1 bytes with a
local wire emitter (independent of io.protowire's emit helpers) and prove
the ImageNet-init workflow end-to-end: conv loading, OIHW→HWIO, fc-layer
skipping, non-packed float encoding, the (C,1,4,4) grouped-deconv layout,
and shared-head dedup.
"""

import struct

import numpy as np
import pytest
import jax

from smallhardface_tpu.io.caffemodel import read_caffemodel, load_into_params
from smallhardface_tpu.models import detector

# --- minimal local protobuf wire emitters (deliberately NOT io.protowire) ---

V1_CONVOLUTION = 4
V1_INNER_PRODUCT = 14
V1_RELU = 18
V1_POOLING = 17
V1_DECONVOLUTION = 39


def _varint(v):
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field, wt):
    return _varint((field << 3) | wt)


def _len_field(field, payload):
    return _tag(field, 2) + _varint(len(payload)) + payload


def _str_field(field, s):
    return _len_field(field, s.encode())


def _varint_field(field, v):
    return _tag(field, 0) + _varint(v)


def _blob_v1(arr, packed=True):
    """BlobProto with legacy num/channels/height/width dims (caffe.proto:
    17-21), 4-D padded with leading 1s like Caffe's legacy writer."""
    arr = np.asarray(arr, np.float32)
    dims = (1,) * (4 - arr.ndim) + arr.shape
    out = bytearray()
    for field, d in zip((1, 2, 3, 4), dims):
        out += _varint_field(field, d)
    flat = arr.reshape(-1)
    if packed:
        out += _len_field(5, struct.pack(f"<{flat.size}f", *flat))
    else:
        for v in flat:           # unpacked encoding: one fixed32 per value
            out += _tag(5, 5) + struct.pack("<f", v)
    return bytes(out)


def _v1_layer(name, type_enum, blobs=(), packed=True):
    out = bytearray()
    out += _str_field(4, name)               # V1LayerParameter.name = 4
    out += _varint_field(5, type_enum)       # V1LayerParameter.type = 5
    for b in blobs:
        out += _len_field(6, _blob_v1(b, packed=packed))   # blobs = 6
    return bytes(out)


def _v1_net(layers):
    out = bytearray()
    out += _str_field(1, "VGG_ILSVRC_16_layers")
    for payload in layers:
        out += _len_field(2, payload)        # NetParameter.layers = 2
    return bytes(out)


def _vgg16_imagenet_v1(rng):
    """A VGG16-ImageNet-shaped V1 file: 13 convs + relus/pools + 3 fc
    layers (INNER_PRODUCT blobs that must be skipped)."""
    weights = {}
    layers = []
    in_c = 3
    for stage, out_c, n in detector.VGG_STAGES:
        for i in range(1, n + 1):
            name = f"{stage}_{i}"
            w = rng.randn(out_c, in_c, 3, 3).astype(np.float32)
            b = rng.randn(out_c).astype(np.float32)
            weights[name] = (w, b)
            # conv1_1's bias uses the unpacked float encoding — old
            # protobuf writers may emit either; both are legal.
            layers.append(_v1_layer(name, V1_CONVOLUTION, [w, b],
                                    packed=(name != "conv1_1")))
            layers.append(_v1_layer(f"relu{stage[4:]}_{i}", V1_RELU))
            in_c = out_c
        layers.append(_v1_layer(f"pool{stage[4:]}", V1_POOLING))
    for fc, (o, i) in (("fc6", (32, 64)), ("fc7", (32, 32)),
                       ("fc8", (10, 32))):
        layers.append(_v1_layer(fc, V1_INNER_PRODUCT,
                                [rng.randn(o, i).astype(np.float32),
                                 rng.randn(o).astype(np.float32)]))
    return _v1_net(layers), weights


def test_v1_vgg16_imagenet_load(tmp_path):
    rng = np.random.RandomState(7)
    data, weights = _vgg16_imagenet_v1(rng)
    path = tmp_path / "vgg16_v1.caffemodel"
    path.write_bytes(data)

    raw = read_caffemodel(str(path))
    assert set(weights) | {"fc6", "fc7", "fc8"} == set(raw)
    # legacy dims resolved: conv weight OIHW, bias (1,1,1,O)
    assert raw["conv3_1"][0].shape == (256, 128, 3, 3)
    assert raw["conv3_1"][1].shape == (1, 1, 1, 256)
    assert raw["fc6"][0].shape == (1, 1, 32, 64)

    spec = detector.ModelSpec(different_dilation=True)
    init = detector.init_params(jax.random.PRNGKey(0), spec)
    before = {k: np.asarray(v["w"]).copy() for k, v in init.items()}
    params = load_into_params(str(path), init)
    for name, (w, b) in weights.items():
        got_w = np.asarray(params[name]["w"])
        np.testing.assert_array_equal(
            got_w, w.transpose(2, 3, 1, 0), err_msg=name)
        np.testing.assert_array_equal(
            np.asarray(params[name]["b"]), b, err_msg=name)
    # unpacked-encoding blob loaded exactly too
    np.testing.assert_array_equal(
        np.asarray(params["conv1_1"]["b"]), weights["conv1_1"][1])
    # non-backbone params untouched by an ImageNet file (kept init)
    for name in ("head", "conv4_fuse_final", "cls_score_1", "conv5_256",
                 "conv5_256_up"):
        np.testing.assert_array_equal(
            np.asarray(params[name]["w"]), before[name], err_msg=name)


def test_v1_full_detector_load(tmp_path):
    """A fully-trained-model-shaped V1 file: shared heads appear as three
    per-layer copies (Caffe name-sharing writes each view), the bilinear
    deconv as a grouped (C,1,4,4) blob."""
    rng = np.random.RandomState(3)
    spec = detector.ModelSpec(different_dilation=True)
    shapes = detector.param_shapes(spec)
    layers = []
    file_w = {}
    for name, tree in shapes.items():
        kh, kw, ci, co = tree["w"]
        if name == "conv5_256_up":
            # grouped deconv: Caffe stores (C, 1, kh, kw); make each
            # channel distinct to pin the positional mapping
            blob = rng.randn(co, 1, kh, kw).astype(np.float32)
            file_w[name] = blob
            layers.append(_v1_layer(name, V1_DECONVOLUTION, [blob]))
            continue
        w = rng.randn(co, ci, kh, kw).astype(np.float32)
        b = rng.randn(co).astype(np.float32)
        file_w[name] = (w, b)
        if name == "head":
            # head_1 is authoritative; head_2/head_4 carry the same shared
            # content in a real file — use different bytes here to prove
            # the loader takes head_1's copy
            layers.append(_v1_layer("head_1", V1_CONVOLUTION, [w, b]))
            junk = rng.randn(*w.shape).astype(np.float32)
            layers.append(_v1_layer("head_2", V1_CONVOLUTION, [junk, b]))
            layers.append(_v1_layer("head_4", V1_CONVOLUTION, [junk, b]))
        else:
            layers.append(_v1_layer(name, V1_CONVOLUTION, [w, b]))
    path = tmp_path / "detector_v1.caffemodel"
    path.write_bytes(_v1_net(layers))

    init = detector.init_params(jax.random.PRNGKey(1), spec)
    params = load_into_params(str(path), init, strict=True)
    for name, tree in shapes.items():
        got_w = np.asarray(params[name]["w"])
        if name == "conv5_256_up":
            blob = file_w[name]
            want = blob[:, 0].transpose(1, 2, 0)[:, :, None, :]  # HWIO
            np.testing.assert_array_equal(got_w, want)
            continue
        w, b = file_w[name]
        np.testing.assert_array_equal(got_w, w.transpose(2, 3, 1, 0),
                                      err_msg=name)
        np.testing.assert_array_equal(np.asarray(params[name]["b"]), b,
                                      err_msg=name)


def test_v1_strict_shape_mismatch(tmp_path):
    """A V1 layer whose blob disagrees with the model shape fails loudly
    under strict=True (the first-contact failure mode the fixture is
    here to catch)."""
    w = np.zeros((64, 3, 5, 5), np.float32)     # conv1_1 is 3×3, not 5×5
    path = tmp_path / "bad_v1.caffemodel"
    path.write_bytes(_v1_net([_v1_layer("conv1_1", V1_CONVOLUTION,
                                        [w, np.zeros(64, np.float32)])]))
    spec = detector.ModelSpec()
    init = detector.init_params(jax.random.PRNGKey(0), spec)
    with pytest.raises(ValueError, match="conv1_1"):
        load_into_params(str(path), init, strict=True)
