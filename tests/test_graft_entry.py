"""Driver-hook regression tests: the multichip dryrun must self-configure its mesh.

Round-1 failure mode: the driver environment pins a single-device platform via a site hook,
so ``dryrun_multichip(8)`` found 1 device and asserted. The hook must (a) reconfigure
in-process when backends are uninitialized, (b) re-exec a subprocess when they are.
"""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_in_process():
    """Under the test env (8 virtual CPU devices) the impl runs directly."""
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g

        g.dryrun_multichip(8)
    finally:
        sys.path.remove(REPO)


def test_dryrun_multichip_reexecs_when_pinned_to_one_device():
    """Simulate the driver: backends initialized with a single device before the call."""
    code = textwrap.dedent(
        """
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 1)
        assert len(jax.devices()) == 1  # backends now initialized, single device
        import __graft_entry__ as g
        g.dryrun_multichip(8)
        print("REEXEC-PATH-OK")
        """
    )
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "REEXEC-PATH-OK" in proc.stdout
    assert "dryrun_multichip OK on 8 devices" in proc.stdout


def test_multihost_distributed_cluster():
    """jax.distributed across 2 coordinated CPU processes: the cross-process psum'd
    variogram equals the single-device result exactly (SURVEY §2.7 DCN path)."""
    from xdem_tpu.parallel.distributed import launch_local_cluster

    out = launch_local_cluster(num_processes=2, local_devices=2)
    assert "DISTRIBUTED OK" in out
    assert "4 global devices" in out
