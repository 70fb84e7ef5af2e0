"""Independent numerics check: the JAX detector forward vs a torch (CPU)
replica built from the same weights. torch's conv/pool/deconv semantics
match Caffe's for the ops this model uses (zero padding, rhs dilation,
ceil-mode max pooling, grouped transposed conv with output size
s(H-1)+k-2p), so agreement here is strong evidence of parity with the
reference's compute graph."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from smallhardface_tpu.models import detector as dm


def _torch_forward(params, x_nchw, spec, dtype=None):
    import torch.nn.functional as F

    dtype = dtype or torch.float64
    t = {k: {kk: torch.from_numpy(np.asarray(vv)).to(dtype)
             for kk, vv in v.items()} for k, v in params.items()}

    def conv(x, name, dilation=1, padding=None):
        w = t[name]["w"].permute(3, 2, 0, 1)   # HWIO -> OIHW
        b = t[name]["b"]
        if padding is None:
            padding = dilation if w.shape[-1] == 3 else 0
        return F.conv2d(x, w, b, padding=padding, dilation=dilation)

    def cbr(x, name, dilation=1):
        return F.relu(conv(x, name, dilation))

    # inference-only oracle: autograd tracking would double the memory
    # and slow the big production-shape fixture regeneration; the
    # decorator form cannot leak no-grad state on exceptions
    @torch.no_grad()
    def _run():
        return _torch_forward_body(x_nchw, spec, t, conv, cbr, F)

    return _run()


def _torch_forward_body(x_nchw, spec, t, conv, cbr, F):
    import torch
    h = x_nchw
    feats = {}
    for si, (stage, _, n) in enumerate(dm.VGG_STAGES):
        for i in range(1, n + 1):
            h = cbr(h, f"{stage}_{i}")
        feats[stage] = h
        if si < len(dm.VGG_STAGES) - 1:
            h = F.max_pool2d(h, 2, 2, ceil_mode=True)

    f5 = F.relu(conv(feats["conv5"], "conv5_256", padding=0))
    up_w = t["conv5_256_up"]["w"]              # (4,4,1,C) HWIO depthwise
    c = up_w.shape[-1]
    w_t = up_w.permute(3, 2, 0, 1)             # (C,1,4,4) = OIHW groups=C
    up = F.conv_transpose2d(f5, w_t, stride=2, padding=1, groups=c)
    f4 = F.relu(conv(feats["conv4"], "conv4_256", padding=0))
    fuse = torch.cat([up, f4], dim=1)
    ff = cbr(fuse, "conv4_fuse_final")
    if spec.different_dilation:
        ff = cbr(ff, "conv4_fuse_final_dim_red")
        cls_list, box_list = [], []
        for k, d in zip(dm.ANCHOR_SCALES, dm.HEAD_DILATIONS):
            hd = F.relu(conv(ff, "head", dilation=d))
            cls_list.append(conv(hd, f"cls_score_{k}", padding=0))
            box_list.append(conv(hd, f"bbox_pred_{k}", padding=0))
        cls = torch.stack(cls_list, dim=-1)     # (B,2,h,w,A)
        box = torch.stack(box_list, dim=-1)     # (B,4,h,w,A)
        cls = cls.permute(0, 2, 3, 4, 1)        # (B,h,w,A,2)
        box = box.permute(0, 2, 3, 4, 1)        # (B,h,w,A,4)
    else:
        hd = cbr(ff, "head")
        raw_cls = conv(hd, "cls_score", padding=0)   # (B,2A,h,w)
        raw_box = conv(hd, "bbox_pred", padding=0)   # (B,4A,h,w)
        b, _, hh, ww = raw_cls.shape
        A = spec.num_anchors
        cls = raw_cls.reshape(b, 2, A, hh, ww).permute(0, 3, 4, 2, 1)
        box = raw_box.reshape(b, A, 4, hh, ww).permute(0, 3, 4, 1, 2)
    return cls.numpy(), box.numpy()


@pytest.mark.parametrize("different_dilation", [True, False])
def test_forward_matches_torch(different_dilation):
    spec = dm.ModelSpec(different_dilation=different_dilation)
    params = dm.init_params(jax.random.PRNGKey(7), spec)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 64, 80, 3).astype(np.float32) * 30

    out = dm.forward(params, jnp.asarray(x), spec)
    cls_j = np.asarray(out["cls_logits"])
    box_j = np.asarray(out["bbox_deltas"])

    x_t = torch.from_numpy(x.transpose(0, 3, 1, 2)).double()
    cls_t, box_t = _torch_forward(params, x_t, spec)

    assert cls_j.shape == cls_t.shape
    assert box_j.shape == box_t.shape
    np.testing.assert_allclose(cls_j, cls_t, rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(box_j, box_t, rtol=1e-3, atol=2e-3)


def test_forward_odd_size_pool_parity():
    """Ceil-mode pooling path: a 48+16-odd input exercising odd spatial dims
    through the stack (only the bucket-padded ×16 path is used in prod, but
    the pool op itself must match Caffe for any size)."""
    from smallhardface_tpu.models.layers import max_pool_2x2
    rng = np.random.RandomState(1)
    x = rng.randn(1, 11, 13, 2).astype(np.float32)
    got = np.asarray(max_pool_2x2(jnp.asarray(x)))
    want = torch.nn.functional.max_pool2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 2, 2,
        ceil_mode=True).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want)
