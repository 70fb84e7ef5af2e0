"""Read Caffe `.caffemodel` weights into the detector's JAX pytree.

Schema subset of /root/reference/caffe/src/caffe/proto/caffe.proto:
  NetParameter: name=1 (string), layer=100 (LayerParameter, new format),
                layers=2 (V1LayerParameter, legacy — the public VGG16
                ImageNet caffemodel uses this).
  LayerParameter:   name=1, type=2 (string), blobs=7
  V1LayerParameter: name=4, type=5 (enum),   blobs=6
  BlobProto: shape=7 (BlobShape{dim=1 packed int64}), data=5 (float),
             legacy dims num=1 channels=2 height=3 width=4

Conv blobs are stored OIHW; the detector uses HWIO (NHWC activations), so
weights are transposed (2, 3, 1, 0). The shared dilated-head weights appear
once per head layer in the file with identical content (Caffe named-param
sharing writes each layer's view); the converter takes `head_1`'s copy for
the structural `head` parameter.
"""

from __future__ import annotations

import logging

import numpy as np

from smallhardface_tpu.io import protowire as pw

logger = logging.getLogger(__name__)


def _parse_blob(raw: bytes) -> np.ndarray:
    shape = None
    legacy = {}
    data = []
    for field, wt, val in pw.iter_fields(raw):
        if field == 7 and wt == pw.WIRE_LEN:      # BlobShape
            dims = []
            for f2, wt2, v2 in pw.iter_fields(val):
                if f2 == 1:
                    if wt2 == pw.WIRE_LEN:
                        dims.extend(pw.parse_packed_varints(v2))
                    else:
                        dims.append(v2)
            shape = tuple(dims)
        elif field == 5:                           # data (float)
            if wt == pw.WIRE_LEN:
                data.extend(pw.parse_packed_floats(val))
            else:
                data.append(np.frombuffer(val, "<f4")[0])
        elif field in (1, 2, 3, 4) and wt == pw.WIRE_VARINT:
            legacy[field] = val
    arr = np.asarray(data, dtype=np.float32)
    if shape is None and legacy:
        shape = tuple(legacy.get(k, 1) for k in (1, 2, 3, 4))
    if shape is not None:
        arr = arr.reshape(shape)
    return arr


def _parse_layer(raw: bytes, name_field: int, blobs_field: int):
    name = None
    blobs = []
    for field, wt, val in pw.iter_fields(raw):
        if field == name_field and wt == pw.WIRE_LEN:
            name = val.decode("utf-8")
        elif field == blobs_field and wt == pw.WIRE_LEN:
            blobs.append(_parse_blob(val))
    return name, blobs


def read_caffemodel(path):
    """Parse a .caffemodel into {layer_name: [np.ndarray blobs]}."""
    with open(path, "rb") as f:
        data = f.read()
    layers = {}
    for field, wt, val in pw.iter_fields(data):
        if field == 100 and wt == pw.WIRE_LEN:      # new-style layer
            name, blobs = _parse_layer(val, name_field=1, blobs_field=7)
        elif field == 2 and wt == pw.WIRE_LEN:      # legacy layers
            name, blobs = _parse_layer(val, name_field=4, blobs_field=6)
        else:
            continue
        if name and blobs:
            layers[name] = blobs
    return layers


def write_caffemodel(path, layers):
    """Serialize {layer_name: [np.ndarray blobs]} as a new-format binary
    NetParameter. Used for fixture generation and export compatibility."""
    out = bytearray()
    out += pw.emit_string(1, "face")
    for name, blobs in layers.items():
        layer = bytearray()
        layer += pw.emit_string(1, name)
        layer += pw.emit_string(2, "Convolution")
        for blob in blobs:
            blob = np.asarray(blob, dtype=np.float32)
            shape_payload = bytearray()
            for d in blob.shape:
                shape_payload += pw.emit_varint_field(1, int(d))
            body = pw.emit_len(7, bytes(shape_payload))
            body += pw.emit_packed_floats(5, blob.reshape(-1).tolist())
            layer += pw.emit_len(7, body)
        out += pw.emit_len(100, bytes(layer))
    with open(path, "wb") as f:
        f.write(bytes(out))


def export_params(path, params):
    """Write the detector pytree as a .caffemodel (inverse of
    load_into_params): HWIO → OIHW, shared head duplicated per dilation."""
    layers = {}
    for name, leaf in params.items():
        w = np.asarray(leaf["w"])
        if name == "conv5_256_up":
            c = w.shape[-1]
            blob = np.ascontiguousarray(
                w[:, :, 0, :].transpose(2, 0, 1)[:, None, :, :])
            layers[name] = [blob]
            continue
        blobs = [np.ascontiguousarray(w.transpose(3, 2, 0, 1))]
        if "b" in leaf:
            blobs.append(np.asarray(leaf["b"]))
        if name == "head":
            for k in (1, 2, 4):
                layers[f"head_{k}"] = blobs
        else:
            layers[name] = blobs
    write_caffemodel(path, layers)


def _conv_w(arr: np.ndarray) -> np.ndarray:
    """OIHW → HWIO."""
    assert arr.ndim == 4, f"expected 4-D conv weight, got {arr.shape}"
    return np.ascontiguousarray(arr.transpose(2, 3, 1, 0))


def load_into_params(path, params, strict=False, file_layers=None):
    """Name-addressed weight copy into an existing param tree, mirroring
    Net::CopyTrainedLayersFrom's silent layer-name matching
    (/root/reference/caffe/src/caffe/net.cpp:733-808).

    Returns a new pytree (numpy leaves); unmatched model params keep their
    existing values, unmatched file layers are ignored (logged).
    `file_layers`: pass a read_caffemodel(path) result to skip re-parsing
    (tools/ap_parity reports coverage from the same parse).
    """
    import jax.numpy as jnp

    if file_layers is None:
        file_layers = read_caffemodel(path)
    out = {k: dict(v) for k, v in params.items()}
    used = set()

    def assign(pname, blobs):
        leaf = out[pname]
        w = _conv_w(blobs[0])
        if tuple(leaf["w"].shape) != w.shape:
            msg = (f"shape mismatch for {pname}: "
                   f"{tuple(leaf['w'].shape)} vs file {w.shape}")
            if strict:
                raise ValueError(msg)
            logger.warning(msg)
            return
        leaf["w"] = jnp.asarray(w)
        if len(blobs) > 1 and "b" in leaf:
            leaf["b"] = jnp.asarray(blobs[1].reshape(-1))

    for fname, blobs in file_layers.items():
        pname = fname
        if fname in ("head_1", "head_2", "head_4"):
            pname = "head"       # shared dilated-head weights
            if pname in used:
                continue
        if fname == "conv5_256_up":
            # fixed bilinear kernel: Caffe stores (C, 1, 4, 4) groups
            if "conv5_256_up" in out:
                k = blobs[0]            # (C,1,kh,kw) or (C,kh,kw)?
                k = k.reshape(k.shape[0], k.shape[-2], k.shape[-1])
                hwio = k.transpose(1, 2, 0)[:, :, None, :]
                out["conv5_256_up"]["w"] = jnp.asarray(
                    np.ascontiguousarray(hwio.transpose(0, 1, 2, 3)))
            used.add("conv5_256_up")
            continue
        if pname not in out:
            logger.info("Ignoring file layer with no model param: %s", fname)
            continue
        assign(pname, blobs)
        used.add(pname)

    missing = [k for k in out if k not in used]
    if missing:
        logger.info("Params not found in %s (kept init): %s", path, missing)
    return out
