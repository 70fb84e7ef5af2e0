"""test_net orchestration: device sharding, caching, demo mode."""

import os
import pickle

import numpy as np
import cv2
import jax
import pytest

from smallhardface_tpu.config import cfg
from smallhardface_tpu.models import detector as dm
from smallhardface_tpu import test_runner


class FakeImdb:
    def __init__(self, paths):
        self._paths = paths
        self._classes = ["bg", "face"]
        self.evaluated = None

    def __len__(self):
        return len(self._paths)

    @property
    def num_classes(self):
        return 2

    @property
    def name(self):
        return "fake"

    def image_path_at(self, i):
        return self._paths[i]

    def evaluate_detections(self, all_boxes, output_dir=None,
                            method_name="x", step=0):
        self.evaluated = all_boxes
        return "ok"


@pytest.fixture
def tiny_test_cfg(tmp_path):
    old = (cfg.TEST.SCALES, cfg.TEST.FLIP, cfg.TPU.TEST_BUCKET,
           cfg.TEST.N_DETS_PER_MODULE, cfg.TEST.MODEL)
    cfg.TEST.SCALES = [50, 90]
    cfg.TEST.FLIP = True
    cfg.TPU.TEST_BUCKET = 64
    cfg.TEST.N_DETS_PER_MODULE = 100
    cfg.TEST.MODEL = ""
    yield
    (cfg.TEST.SCALES, cfg.TEST.FLIP, cfg.TPU.TEST_BUCKET,
     cfg.TEST.N_DETS_PER_MODULE, cfg.TEST.MODEL) = old


def _images(tmp_path, n):
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        im = rng.randint(0, 255, (70, 90, 3), dtype=np.uint8)
        p = str(tmp_path / f"t{i}.jpg")
        cv2.imwrite(p, im)
        paths.append(p)
    return paths


def test_test_net_shards_and_caches(tmp_path, tiny_test_cfg):
    imdb = FakeImdb(_images(tmp_path, 5))
    out = str(tmp_path / "out")
    os.makedirs(out)
    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(0), spec)
    result = test_runner.test_net(imdb, out, thresh=0.05, no_cache=False,
                                  params=params, spec=spec)
    assert result == "ok"
    assert len(imdb.evaluated[1]) == 5
    for d in imdb.evaluated[1]:
        assert d.ndim == 2 and d.shape[1] == 5
    # cache written and reused
    cache = os.path.join(out, "detections.pkl")
    assert os.path.exists(cache)
    with open(cache, "rb") as f:
        cached = pickle.load(f)
    imdb2 = FakeImdb(imdb._paths)
    test_runner.test_net(imdb2, out, thresh=0.05, no_cache=False,
                         params=params, spec=spec)
    np.testing.assert_array_equal(imdb2.evaluated[1][0], cached[1][0])


def test_demo_mode(tmp_path, tiny_test_cfg):
    old = (cfg.TEST.DEMO.ENABLE, cfg.TEST.DEMO.IMAGE)
    img = _images(tmp_path, 1)[0]
    cfg.TEST.DEMO.ENABLE = True
    cfg.TEST.DEMO.IMAGE = img
    try:
        spec = dm.ModelSpec(different_dilation=True)
        params = dm.init_params(jax.random.PRNGKey(0), spec)
        test_runner.test_net(None, str(tmp_path), thresh=0.05,
                             params=params, spec=spec)
        assert os.path.exists("/tmp/demo_res.jpg")
    finally:
        cfg.TEST.DEMO.ENABLE, cfg.TEST.DEMO.IMAGE = old


def test_eval_batch_matches_per_image(tmp_path, tiny_test_cfg):
    """TPU.EVAL_BATCH groups same-bucket images into one dispatch; the
    detections must match the per-image pipeline."""
    imdb = FakeImdb(_images(tmp_path, 5))     # all same size -> one bucket
    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(0), spec)
    old = (cfg.TPU.EVAL_BATCH, cfg.TPU.VOTE_CAP)
    try:
        cfg.TPU.VOTE_CAP = 4096
        cfg.TPU.EVAL_BATCH = 1
        out1 = str(tmp_path / "o1"); os.makedirs(out1)
        test_runner.test_net(imdb, out1, thresh=0.05, no_cache=True,
                             params=params, spec=spec)
        single = [d.copy() for d in imdb.evaluated[1]]
        cfg.TPU.EVAL_BATCH = 2                # 2 full batches + 1 leftover
        imdb2 = FakeImdb(imdb._paths)
        out2 = str(tmp_path / "o2"); os.makedirs(out2)
        test_runner.test_net(imdb2, out2, thresh=0.05, no_cache=True,
                             params=params, spec=spec)
        batched = imdb2.evaluated[1]
        for a, b in zip(single, batched):
            assert a.shape == b.shape
            np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-3)
    finally:
        cfg.TPU.EVAL_BATCH, cfg.TPU.VOTE_CAP = old


def test_spatial_devices_eval_matches_per_device(tmp_path, tiny_test_cfg):
    """TPU.SPATIAL_DEVICES=4 on the 8-device CPU mesh: two data-parallel
    groups of 4, each image H-sharded across its group — detections match
    the plain one-worker-per-device run to last-ulp float reassociation
    (XLA's partitioner reorders reductions around the halo exchanges;
    observed max diff 8e-6)."""
    imdb = FakeImdb(_images(tmp_path, 4))
    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(0), spec)
    old = cfg.TPU.SPATIAL_DEVICES
    try:
        cfg.TPU.SPATIAL_DEVICES = 1
        out1 = str(tmp_path / "p1"); os.makedirs(out1)
        test_runner.test_net(imdb, out1, thresh=0.05, no_cache=True,
                             params=params, spec=spec)
        plain = [d.copy() for d in imdb.evaluated[1]]
        cfg.TPU.SPATIAL_DEVICES = 4
        imdb2 = FakeImdb(imdb._paths)
        out2 = str(tmp_path / "p2"); os.makedirs(out2)
        test_runner.test_net(imdb2, out2, thresh=0.05, no_cache=True,
                             params=params, spec=spec)
        for a, b in zip(plain, imdb2.evaluated[1]):
            assert a.shape == b.shape
            np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-4)
    finally:
        cfg.TPU.SPATIAL_DEVICES = old


def test_spatial_devices_must_divide(tmp_path, tiny_test_cfg):
    imdb = FakeImdb(_images(tmp_path, 2))
    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(0), spec)
    old = cfg.TPU.SPATIAL_DEVICES
    try:
        cfg.TPU.SPATIAL_DEVICES = 3           # 8 % 3 != 0
        with pytest.raises(ValueError, match="must divide"):
            test_runner.run_inference(imdb, params, spec, 0.05)
    finally:
        cfg.TPU.SPATIAL_DEVICES = old
