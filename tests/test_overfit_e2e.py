"""Full train→test→AP end-to-end check (scripts/overfit_check.py).

Gated behind RUN_OVERFIT_E2E=1: a 400-iteration VGG-16 training run takes
hours on this image's single CPU core (minutes on a real chip or a
multi-core host). Evidence from the TPU run is recorded in
OVERFIT_CHECK.md; this wrapper keeps the check runnable as a test on
capable machines.
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(os.environ.get("RUN_OVERFIT_E2E") != "1",
                    reason="set RUN_OVERFIT_E2E=1 (takes ~hours on 1 CPU "
                           "core; see OVERFIT_CHECK.md for TPU evidence)")
def test_overfit_end_to_end_cpu_mesh():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from overfit_check import run
    aps = run(iters=400, n_dev=2, verbose=False)
    assert min(aps) > 0.95, f"AP={aps}"
