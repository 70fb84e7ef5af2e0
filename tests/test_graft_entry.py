"""Driver-contract tests for __graft_entry__.

The driver calls dryrun_multichip(8) from a process whose JAX backend is
already initialized with ONE device (the axon TPU tunnel). The entry point
must self-provision a virtual 8-device CPU mesh in a subprocess rather than
assert devices exist (round-1 failure: MULTICHIP_r01.json rc=1).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_from_single_device_parent():
    env = dict(os.environ)
    env.pop("_SHF_DRYRUN_CHILD", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    code = (
        "import jax\n"
        # the axon site package overrides JAX_PLATFORMS from the env;
        # config wins over it (and keeps this test off the TPU tunnel,
        # whose cold init can block for minutes in bad weather)
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert jax.device_count() == 1, jax.device_count()\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "print('PARENT_OK')\n")
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}")
    assert "PARENT_OK" in proc.stdout


def test_entry_compiles_single_device():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import __graft_entry__ as g\n"
        "fn, args = g.entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "import jax.numpy as jnp\n"
        "leaves = jax.tree_util.tree_leaves(out)\n"
        "assert all(bool(jnp.isfinite(l).all()) for l in leaves)\n"
        "print('ENTRY_OK')\n")
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "ENTRY_OK" in proc.stdout
