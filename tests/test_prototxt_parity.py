"""Mechanical structural parity against the ACTUAL reference templates.

Every other model test (the JAX forward, its torch oracle, the golden
fixtures) was written from a human reading of the prototxt; a shared
misreading would pass them all.  These tests close that hole: they parse
the reference template bytes (/root/reference/models/*.prototxt), replay
the programmatic surgery of /root/reference/lib/prototxt/manipulate.py
(dim-red insert at :166-188, lr multipliers at :154-163), and assert —
layer by layer — that the traced jaxpr of models.detector.forward executes
the same network: kernel/pad/stride/dilation/channels/groups, weight
sharing, connectivity (incl. ReLU placement and concat operand order),
ParamSpec lr/decay multipliers, fillers, loss wiring, and solver fields.

A failing assertion names the prototxt layer so the divergence can be
traced to the template line.
"""

import ast
import inspect
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from smallhardface_tpu.config import cfg
from smallhardface_tpu.io.prototxt import (
    load_prototxt, parse_prototxt, add_dimension_reduction, apply_mult_lr,
    param_specs)
from smallhardface_tpu.models import detector
from smallhardface_tpu.models.layers import bilinear_kernel
from smallhardface_tpu.train import losses, solver

REF_MODELS = "/root/reference/models"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_MODELS), reason="reference templates not present")


# ---------------------------------------------------------------------------
# Prototxt-side graph derivation
# ---------------------------------------------------------------------------

def surgered(template, *, different_dilation, backbone_mult=None,
             head_mult=None):
    net = load_prototxt(os.path.join(REF_MODELS, template))
    net = add_dimension_reduction(net, different_dilation)
    if backbone_mult is not None:
        net = apply_mult_lr(net, backbone_mult, head_mult)
    return net


def derive_graph(net):
    """Walk the layer list tracking blob channels / producers / in-place
    ReLU state; return (conv_descs, blobs, layers_by_name)."""
    blobs = {}   # blob -> dict(channels, producer, kind, relu)
    for inp in net.getlist("input"):
        shapes = net.getlist("input_shape")
        idx = net.getlist("input").index(inp)
        dims = shapes[idx].getlist("dim")
        ch = dims[1] if len(dims) == 4 else None
        blobs[inp] = dict(channels=ch, producer=inp, kind="input",
                          relu=False)
    convs = []
    layers_by_name = {}
    for layer in net.getlist("layer"):
        name = layer.get("name")
        ltype = layer.get("type")
        layers_by_name[name] = layer
        bottoms = layer.getlist("bottom")
        tops = layer.getlist("top")
        if ltype == "Python":
            for t in tops:
                # RoIDataLayer: 'data' is the 3-channel image blob
                blobs[t] = dict(channels=3 if t == "data" else None,
                                producer=name, kind="input", relu=False)
            continue
        if ltype in ("Convolution", "Deconvolution"):
            cp = layer.get("convolution_param")
            k = cp.getlist("kernel_size")[0]
            pad = (cp.getlist("pad") or [0])[0]
            stride = (cp.getlist("stride") or [1])[0]
            dilation = (cp.getlist("dilation") or [1])[0]
            group = cp.get("group", 1)
            out = cp.get("num_output")
            bias = cp.get("bias_term", True)
            in_ch = blobs[bottoms[0]]["channels"]
            wf = cp.get("weight_filler")
            bf = cp.get("bias_filler")
            convs.append(dict(
                name=name, deconv=(ltype == "Deconvolution"), k=k, pad=pad,
                stride=stride, dilation=dilation, group=group,
                in_channels=in_ch, out_channels=out, bias_term=bias,
                weight_filler=(None if wf is None else
                               (wf.get("type"), wf.get("std", 0.01))),
                bias_filler=(None if bf is None else
                             (bf.get("type"), bf.get("value", 0.0))),
                bottom=bottoms[0],
                bottom_producer=blobs[bottoms[0]]["producer"],
                bottom_kind=blobs[bottoms[0]]["kind"],
                bottom_relu=blobs[bottoms[0]]["relu"],
                params=param_specs(layer),
                shared=[p.get("name", "") for p in layer.getlist("param")],
            ))
            blobs[tops[0]] = dict(channels=out, producer=name, kind="conv",
                                  relu=False)
        elif ltype == "Pooling":
            pp = layer.get("pooling_param")
            assert pp.get("pool") == "MAX", name
            assert pp.get("kernel_size") == 2 and pp.get("stride") == 2, name
            src = blobs[bottoms[0]]
            blobs[tops[0]] = dict(channels=src["channels"], producer=name,
                                  kind="pool", relu=False)
        elif ltype == "ReLU":
            assert bottoms[0] == tops[0], f"{name}: templates use in-place"
            blobs[bottoms[0]]["relu"] = True
        elif ltype == "Concat":
            axis = layer.get("concat_param").get("axis", 1)
            chans = [blobs[b]["channels"] for b in bottoms]
            ch = sum(chans) if axis == 1 else chans[0]
            blobs[tops[0]] = dict(channels=ch, producer=name, kind="concat",
                                  relu=False, order=list(bottoms))
        elif ltype in ("Softmax", "Reshape"):
            src = blobs[bottoms[0]]
            blobs[tops[0]] = dict(channels=src["channels"], producer=name,
                                  kind=ltype.lower(), relu=False)
        elif ltype in ("SoftmaxWithLoss", "SmoothL1Loss"):
            blobs[tops[0]] = dict(channels=1, producer=name, kind="loss",
                                  relu=False)
        else:
            raise AssertionError(f"unhandled layer type {ltype} ({name})")
    return convs, blobs, layers_by_name


# ---------------------------------------------------------------------------
# Jaxpr-side extraction
# ---------------------------------------------------------------------------

def trace_forward(spec):
    shapes = detector.param_shapes(spec)
    params = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s, jnp.float32), shapes,
        is_leaf=lambda x: isinstance(x, tuple))
    x = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
    jaxpr = jax.make_jaxpr(
        lambda p, xx: detector.forward(p, xx, spec, mask_mode="where")
    )(params, x)
    leaves = jax.tree_util.tree_flatten_with_path((params, x))[0]
    invar_path = {}
    for (path, _), var in zip(leaves, jaxpr.jaxpr.invars):
        keys = tuple(getattr(p, "key", getattr(p, "idx", None))
                     for p in path)
        invar_path[id(var)] = keys
    producers = {}
    for eqn in jaxpr.jaxpr.eqns:
        for out in eqn.outvars:
            producers[id(out)] = eqn
    return jaxpr, invar_path, producers


def trace_source(var, producers, invar_path):
    """Walk a conv's input back to its producing conv/pool/concat (or the
    network input), recording whether a ReLU was crossed."""
    relu = False
    for _ in range(64):
        if id(var) in invar_path:
            return ("input", invar_path[id(var)], relu, None)
        eqn = producers.get(id(var))
        assert eqn is not None, "reached an unproduced var"
        prim = str(eqn.primitive)
        if prim in ("conv_general_dilated", "reduce_window_max",
                    "concatenate"):
            return (prim, None, relu, eqn)
        if prim == "custom_jvp_call":   # jax.nn.relu
            relu = True
            var = eqn.invars[0]
        elif prim == "add":
            # skip the broadcast-bias operand
            cands = [v for v in eqn.invars
                     if not (id(v) in producers and
                             str(producers[id(v)].primitive) ==
                             "broadcast_in_dim")]
            assert len(cands) == 1, "ambiguous add in conv input chain"
            var = cands[0]
        elif prim in ("convert_element_type", "reshape", "transpose",
                      "max", "select_n"):
            var = eqn.invars[0]
        else:
            raise AssertionError(f"unexpected primitive {prim} in chain")
    raise AssertionError("producer chain too deep")


def jaxpr_convs(jaxpr, invar_path, producers):
    """All conv eqns with their weight param path and resolved attributes."""
    out = []
    for eqn in jaxpr.jaxpr.eqns:
        if str(eqn.primitive) != "conv_general_dilated":
            continue
        wpath = invar_path.get(id(eqn.invars[1]))
        assert wpath is not None, "conv weight is not a parameter leaf"
        # path like (0, 'head', 'w') — (params, x) tuple index first
        out.append(dict(
            eqn=eqn, leaf=wpath[1], field=wpath[2],
            wshape=tuple(eqn.invars[1].aval.shape),
            padding=eqn.params["padding"],
            strides=eqn.params["window_strides"],
            rhs_dilation=eqn.params["rhs_dilation"],
            lhs_dilation=eqn.params["lhs_dilation"],
            groups=eqn.params["feature_group_count"],
            src=trace_source(eqn.invars[0], producers, invar_path),
            weight_var=eqn.invars[1],
        ))
    return out


def match_convs(proto_convs, jconvs, name_map):
    """Pair every prototxt conv layer with exactly one jaxpr conv eqn via
    (param leaf, dilation); returns list of (proto, jaxpr) pairs."""
    unused = list(jconvs)
    pairs = []
    for pc in proto_convs:
        leaf = name_map(pc["name"])
        cands = [jc for jc in unused if jc["leaf"] == leaf and
                 jc["rhs_dilation"] == (pc["dilation"],) * 2]
        assert len(cands) == 1, (
            f"{pc['name']}: expected exactly one jaxpr conv for leaf "
            f"{leaf!r} dilation {pc['dilation']}, found {len(cands)}")
        unused.remove(cands[0])
        pairs.append((pc, cands[0]))
    assert not unused, (
        f"jaxpr has convs with no prototxt counterpart: "
        f"{[jc['leaf'] for jc in unused]}")
    return pairs


def dd_name_map(name):
    return "head" if name.startswith("head_") else name


# ---------------------------------------------------------------------------
# Structural parity of the executed forward
# ---------------------------------------------------------------------------

def check_template_parity(template, spec, name_map):
    net = surgered(template, different_dilation=spec.different_dilation)
    proto_convs, blobs, layers = derive_graph(net)
    jaxpr, invar_path, producers = trace_forward(spec)
    jconvs = jaxpr_convs(jaxpr, invar_path, producers)
    pairs = match_convs(proto_convs, jconvs, name_map)
    shapes = detector.param_shapes(spec)

    leaf_weight_var = {}
    for pc, jc in pairs:
        n = pc["name"]
        # --- kernel/channel/group geometry ---
        expect_w = (pc["k"], pc["k"], pc["in_channels"] // pc["group"],
                    pc["out_channels"])
        assert jc["wshape"] == expect_w, (
            f"{n}: weight shape {jc['wshape']} != template-derived "
            f"{expect_w}")
        assert jc["groups"] == pc["group"], n
        assert shapes[name_map(n)]["w"] == expect_w, (
            f"{n}: param_shapes disagrees with template")
        assert ("b" in shapes[name_map(n)]) == pc["bias_term"], (
            f"{n}: bias presence != template bias_term")
        # --- padding / stride / dilation ---
        if pc["deconv"]:
            # fractionally-strided equivalent: lhs_dilation = stride,
            # explicit pad k-1-p per side
            assert jc["lhs_dilation"] == (pc["stride"],) * 2, n
            ep = pc["k"] - 1 - pc["pad"]
            assert jc["padding"] == ((ep, ep), (ep, ep)), (
                f"{n}: deconv padding {jc['padding']} != (k-1-p)={ep}")
            assert jc["strides"] == (1, 1), n
        else:
            assert jc["lhs_dilation"] == (1, 1), n
            assert jc["strides"] == (pc["stride"],) * 2, n
            p = pc["pad"]
            assert jc["padding"] == ((p, p), (p, p)), (
                f"{n}: padding {jc['padding']} != template pad {p}")
        # --- weight sharing (param { name: ... } ⇒ same leaf/invar) ---
        leaf = name_map(n)
        shared_names = [s for s in pc["shared"] if s]
        if leaf in leaf_weight_var:
            assert leaf_weight_var[leaf] is jc["weight_var"], (
                f"{n}: shares prototxt param name but uses a different "
                f"parameter leaf")
            assert shared_names, (
                f"{n}: model shares weights across layers but the template "
                f"declares no shared param name")
        leaf_weight_var[leaf] = jc["weight_var"]
        # --- connectivity + ReLU placement ---
        kind, path, relu, src_eqn = jc["src"]
        if pc["bottom_kind"] == "input":
            assert kind == "input" and path[0] == 1, (
                f"{n}: expected network input, traced to {kind}/{path}")
        elif pc["bottom_kind"] == "conv":
            assert kind == "conv_general_dilated", (
                f"{n}: expected conv-produced input, got {kind}")
            src_w = invar_path[id(src_eqn.invars[1])]
            assert src_w[1] == name_map(pc["bottom_producer"]), (
                f"{n}: bottom produced by {src_w[1]}, template says "
                f"{pc['bottom_producer']}")
        elif pc["bottom_kind"] == "pool":
            assert kind == "reduce_window_max", (
                f"{n}: expected pooled input, got {kind}")
        elif pc["bottom_kind"] == "concat":
            assert kind == "concatenate", (
                f"{n}: expected concat input, got {kind}")
            order = blobs[pc["bottom"]]["order"]
            assert len(src_eqn.invars) == len(order), n
            for opv, blob in zip(src_eqn.invars, order):
                ok, op_path, _, op_eqn = trace_source(
                    opv, producers, invar_path)
                assert ok == "conv_general_dilated", n
                got = invar_path[id(op_eqn.invars[1])][1]
                want = name_map(blobs[blob]["producer"])
                assert got == want, (
                    f"{n}: concat operand order {got} != template "
                    f"bottom order {want}")
        assert relu == pc["bottom_relu"], (
            f"{n}: ReLU-before-consumption is {relu}, template in-place "
            f"ReLU state is {pc['bottom_relu']}")
    return net, proto_convs, layers


def test_test_template_different_dilation_parity():
    spec = detector.ModelSpec(different_dilation=True)
    net, proto_convs, layers = check_template_parity(
        "test_different_dilation_template.prototxt", spec, dd_name_map)
    # 27 convs incl. the surgically inserted dim-red
    assert len(proto_convs) == 27
    names = [pc["name"] for pc in proto_convs]
    assert "conv4_fuse_final_dim_red" in names
    # heads declare shared param names in the template
    for k in (1, 2, 4):
        assert layers[f"head_{k}"] is not None
        specs = param_specs(layers[f"head_{k}"])
        assert specs[0][0] == "head_w" and specs[1][0] == "head_b", (
            "template head params are not name-shared?")
    # proposal layer config matches the model constants
    prop = layers["proposal"]
    pstr = ast.literal_eval(prop.get("python_param").get("param_str"))
    assert pstr["scales"] == list(detector.ANCHOR_SCALES)
    assert pstr["feat_stride"] == [detector.FEAT_STRIDE] * len(
        detector.ANCHOR_SCALES)
    assert pstr["ratios"] == [1]
    # cls reshape contract: concat axis 2 (per-head 2-ch maps stacked along
    # H), softmax over the 2 channels, reshape back to 2A channels
    assert layers["cls_score_output_concat"].get(
        "concat_param").get("axis") == 2
    assert layers["bbox_pred_output_concat"].get(
        "concat_param").get("axis", 1) == 1
    dims = layers["cls_prob_reshape"].get("reshape_param").get(
        "shape").getlist("dim")
    assert dims == [0, spec.num_anchors * spec.num_classes, -1, 0]


def test_test_template_single_head_parity():
    spec = detector.ModelSpec(different_dilation=False)
    net, proto_convs, layers = check_template_parity(
        "test_template.prototxt", spec, lambda n: n)
    assert len(proto_convs) == 20      # no dim-red insert
    # channel-pairing contract: reshape (0,2,-1,0) → softmax(axis 1) →
    # reshape (0,6,-1,0): NCHW channel a pairs with channel A+a
    d1 = layers["cls_reshape"].get("reshape_param").get(
        "shape").getlist("dim")
    assert d1 == [0, 2, -1, 0]
    d2 = layers["cls_prob_reshape"].get("reshape_param").get(
        "shape").getlist("dim")
    assert d2 == [0, spec.num_anchors * spec.num_classes, -1, 0]
    prop = layers["proposal"]
    pstr = ast.literal_eval(prop.get("python_param").get("param_str"))
    assert pstr["scales"] == list(detector.ANCHOR_SCALES)
    A = spec.num_anchors
    # emulate the Caffe chain on a probe and check the documented pairing
    rng = np.random.RandomState(0)
    raw = rng.randn(1, 2 * A, 5, 7).astype(np.float64)
    r = raw.reshape(1, 2, A * 5, 7)                   # reshape (0,2,-1,0)
    e = np.exp(r - r.max(axis=1, keepdims=True))
    prob = (e / e.sum(axis=1, keepdims=True)).reshape(1, 2 * A, 5, 7)
    for a in range(A):
        pair = np.stack([raw[0, a], raw[0, A + a]], axis=0)
        ee = np.exp(pair - pair.max(axis=0, keepdims=True))
        want = ee / ee.sum(axis=0, keepdims=True)
        np.testing.assert_allclose(prob[0, a], want[0], rtol=1e-12)
        np.testing.assert_allclose(prob[0, A + a], want[1], rtol=1e-12)


def test_train_template_matches_test_template():
    """The train graph's conv stack must be the exact test-graph stack
    (the reference trains and tests one network)."""
    for dd, train_t, test_t in [
            (True, "train_different_dilation_template.prototxt",
             "test_different_dilation_template.prototxt"),
            (False, "train_template.prototxt", "test_template.prototxt")]:
        tr, _, _ = derive_graph(surgered(train_t, different_dilation=dd))
        te, _, _ = derive_graph(surgered(test_t, different_dilation=dd))
        tr = [{k: v for k, v in c.items()} for c in tr]
        te = [{k: v for k, v in c.items()} for c in te]
        assert [c["name"] for c in tr] == [c["name"] for c in te]
        for a, b in zip(tr, te):
            for key in ("k", "pad", "stride", "dilation", "group",
                        "in_channels", "out_channels", "bias_term",
                        "weight_filler", "bias_filler", "params", "shared",
                        "bottom", "bottom_relu"):
                assert a[key] == b[key], (
                    f"{a['name']}.{key}: train {a[key]} != test {b[key]}")


@pytest.mark.parametrize("dd", [True, False])
@pytest.mark.parametrize("bm,hm", [(2.0, 1.0), (3.5, 0.5)])
def test_lr_decay_multipliers_parity(bm, hm, dd):
    """param_multipliers must equal the template ParamSpecs after
    _apply_mult_lr (manipulate.py:154-163), for the default config mults
    and for arbitrary ones — on both the different-dilation and the
    single-head train templates."""
    template = ("train_different_dilation_template.prototxt" if dd
                else "train_template.prototxt")
    net = surgered(template, different_dilation=dd,
                   backbone_mult=bm, head_mult=hm)
    proto_convs, _, _ = derive_graph(net)
    spec = detector.ModelSpec(different_dilation=dd,
                              backbone_lr_mult=bm, head_lr_mult=hm)
    lr, decay = detector.param_multipliers(spec)
    seen = {}
    name_map = dd_name_map if dd else (lambda n: n)
    for pc in proto_convs:
        leaf = name_map(pc["name"])
        specs = pc["params"]
        expect = {}
        expect["w"] = (specs[0][1], specs[0][2])
        if pc["bias_term"]:
            assert len(specs) == 2, pc["name"]
            expect["b"] = (specs[1][1], specs[1][2])
        if leaf in seen:
            assert seen[leaf] == expect, (
                f"{pc['name']}: shared layers disagree on ParamSpecs")
        seen[leaf] = expect
        for field, (elr, edecay) in expect.items():
            assert lr[leaf][field] == pytest.approx(elr), (
                f"{pc['name']}.{field}: lr_mult {lr[leaf][field]} != "
                f"template {elr}")
            assert decay[leaf][field] == pytest.approx(edecay), (
                f"{pc['name']}.{field}: decay_mult {decay[leaf][field]} != "
                f"template {edecay}")
    assert set(seen) == set(lr), (
        f"param tree / template layer mismatch: {set(seen) ^ set(lr)}")


def test_fillers_parity():
    """init_params follows the template fillers: gaussian std per layer,
    bilinear deconv, zero biases.  Backbone convs carry NO filler in the
    templates (Caffe default constant-0 — only trainable from ImageNet
    weights); the repo's documented divergence is He init there."""
    net = surgered("test_different_dilation_template.prototxt",
                   different_dilation=True)
    proto_convs, _, _ = derive_graph(net)
    spec = detector.ModelSpec(different_dilation=True)
    params = detector.init_params(jax.random.PRNGKey(0), spec)
    backbone = {f"{s}_{i}" for s, _, n in detector.VGG_STAGES
                for i in range(1, n + 1)}
    for pc in proto_convs:
        leaf = dd_name_map(pc["name"])
        w = np.asarray(params[leaf]["w"])
        if pc["weight_filler"] is None:
            assert pc["name"] in backbone, (
                f"{pc['name']}: template has no filler but layer is not "
                f"backbone — init contract unknown")
            he = np.sqrt(2.0 / (pc["k"] * pc["k"] * pc["in_channels"]))
            assert abs(w.std() - he) < 0.25 * he, pc["name"]
        elif pc["weight_filler"][0] == "gaussian":
            std = pc["weight_filler"][1]
            assert abs(w.std() - std) < 0.15 * std, (
                f"{pc['name']}: init std {w.std():.4f} != template "
                f"gaussian {std}")
        elif pc["weight_filler"][0] == "bilinear":
            np.testing.assert_allclose(
                w, bilinear_kernel(pc["stride"], pc["out_channels"]),
                err_msg=pc["name"])
        else:
            raise AssertionError(pc["weight_filler"])
        if pc["bias_term"]:
            assert pc["bias_filler"] in (None, ("constant", 0.0),
                                         ("constant", 0)), pc["name"]
            np.testing.assert_array_equal(
                np.asarray(params[leaf]["b"]), 0.0, err_msg=pc["name"])


def test_train_template_loss_wiring():
    net = surgered("train_different_dilation_template.prototxt",
                   different_dilation=True)
    _, _, layers = derive_graph(net)
    cls_loss = layers["cls_loss"]
    assert cls_loss.get("type") == "SoftmaxWithLoss"
    lp = cls_loss.get("loss_param")
    assert lp.get("ignore_label") == -1
    assert lp.get("normalize") is True
    assert cls_loss.get("loss_weight", 1) == 1
    assert cls_loss.getlist("propagate_down") == [1, 0]
    # my CE: ignore −1, normalize by valid count (Caffe VALID)
    logits = jnp.asarray(np.random.RandomState(1).randn(8, 2), jnp.float32)
    labels = jnp.asarray([0, 1, -1, 1, -1, 0, 1, -1], jnp.float32)
    got = float(losses.softmax_ce_with_ignore(logits, labels))
    lp_np = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    want = -np.mean([lp_np[i, int(l)] for i, l in enumerate(
        np.asarray(labels)) if l >= 0])
    assert got == pytest.approx(want, rel=1e-5)

    reg_loss = layers["reg_loss"]
    assert reg_loss.get("type") == "SmoothL1Loss"
    sigma = reg_loss.get("smooth_l1_loss_param").get("sigma")
    assert inspect.signature(losses.smooth_l1).parameters[
        "sigma"].default == sigma
    assert reg_loss.get("loss_weight", 1) == 1
    assert len(reg_loss.getlist("bottom")) == 4   # pred/targets/in_w/out_w

    target = layers["target_layer"]
    tstr = ast.literal_eval(target.get("python_param").get("param_str"))
    assert tstr["scales"] == list(detector.ANCHOR_SCALES)
    assert tstr["feat_stride"] == [detector.FEAT_STRIDE] * 3
    assert tstr["ratios"] == [1]
    assert tstr["ohem"] is True
    assert tstr["allowed_border"] == [0, 0, 0]
    from smallhardface_tpu.train.targets import TargetConfig
    assert TargetConfig.allowed_border == 0.0
    # loss bottoms: CE reads the axis-2 concat; SmoothL1 reads the axis-1
    # concat of bbox preds; targets read the reshaped softmax input
    assert cls_loss.getlist("bottom")[0] == "cls_score_output"
    assert reg_loss.getlist("bottom")[0] == "bbox_pred_output"


def test_solver_template_parity():
    """Replay manipulate_solver (manipulate.py:13-32) over the template
    with the shipped config defaults and assert the training loop uses the
    same solver semantics."""
    with open(os.path.join(REF_MODELS, "solver_template.prototxt")) as f:
        sw = parse_prototxt(f.read())
    # fields manipulate_solver overwrites from cfg
    iter_size = cfg.TRAIN.ITERSIZE
    base_lr = cfg.TRAIN.LR.BASELR
    weight_decay = cfg.TRAIN.WEIGHT_DECAY
    assert cfg.TRAIN.LR_POLICY == "STEP"
    stepsize = cfg.TRAIN.STEPSIZE
    # untouched template fields must match the repo's hardcoded semantics
    assert sw.get("momentum") == pytest.approx(0.9)
    assert cfg.TRAIN.MOMENTUM == pytest.approx(sw.get("momentum"))
    assert sw.get("gamma") == pytest.approx(cfg.TRAIN.GAMMA)
    assert sw.get("average_loss") == 100    # train_loop loss_window maxlen
    import smallhardface_tpu.train.train_loop as tl
    src = inspect.getsource(tl.train_net)
    assert "maxlen=100" in src, "smoothed-loss window != solver average_loss"
    assert sw.get("lr_policy") == "step"
    # the template's own values for overwritten fields agree with the
    # config defaults the reference ships (sanity on the config port)
    assert sw.get("iter_size") == iter_size == 2
    assert sw.get("base_lr") == pytest.approx(base_lr) == 0.004
    assert weight_decay == pytest.approx(0.00025)
    # my LR schedule reproduces step policy off these fields
    it = stepsize + 1
    assert solver.learning_rate(it, cfg) == pytest.approx(
        base_lr * cfg.TRAIN.GAMMA)
    assert solver.learning_rate(stepsize - 1, cfg) == pytest.approx(base_lr)
