"""Prebaked compilation caches for the multi-chip dry-run.

The driver's `dryrun_multichip` budget is dominated by one-time costs on a
cold machine: python-tracing + StableHLO-exporting every mesh-sharded
prover stage (persistent exported-stage cache) and XLA-compiling the
resulting modules (persistent compilation cache).  Both caches are
content-keyed — stage blobs by (stage key, source fingerprint, jax
version, backend) and XLA entries by HLO hash — so shipping them with the
repo is safe: stale entries simply miss and the stage is rebuilt.

`install()` copies any repo-shipped cache entries into the live cache
directories (honoring the VALIDA_TPU_STAGE_CACHE / VALIDA_TPU_XLA_CACHE
overrides).  `python -m valida_tpu.tooling.prebaked` re-bakes the caches
by running the dry-run in a subprocess that writes directly into the
repo's cache directories; run it after any change to `valida_tpu/*.py`
(the source fingerprint changes and the stage entries go stale).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
PREBAKED_DIR = os.path.join(_REPO, "valida_tpu", "cache", "dryrun")


def _targets():
    return {
        "stages": os.path.expanduser(
            os.environ.get("VALIDA_TPU_STAGE_CACHE",
                           "~/.cache/valida_tpu_stages")
        ),
        "xla": os.path.expanduser(
            os.environ.get("VALIDA_TPU_XLA_CACHE", "~/.cache/valida_tpu_xla")
        ),
    }


def install() -> int:
    """Copy repo-shipped cache entries into the live cache dirs (skipping
    files already present).  Returns the number of files installed.

    Stage-cache blobs (jax.export'd StableHLO) are host-portable and
    copied flat.  XLA AOT entries are NOT portable across CPU feature
    sets; they live under a `cpu-<fingerprint>` subdir (see
    backend._host_cpu_fingerprint) and are installed only when the baked
    fingerprint matches this host — a mismatch means the entries simply
    miss and the stages recompile, never a SIGILL."""
    from ..backend import _host_cpu_fingerprint

    n = 0
    for sub, dst in _targets().items():
        src = os.path.join(PREBAKED_DIR, sub)
        if not os.path.isdir(src):
            continue
        if sub == "xla":
            fp = f"cpu-{_host_cpu_fingerprint()}"
            src = os.path.join(src, fp)
            dst = os.path.join(dst, fp)
            if not os.path.isdir(src):
                continue
        os.makedirs(dst, exist_ok=True)
        for name in os.listdir(src):
            s = os.path.join(src, name)
            t = os.path.join(dst, name)
            if os.path.isfile(s) and not os.path.exists(t):
                shutil.copyfile(s, t)
                n += 1
    return n


def bake(n_devices: int = 8) -> None:
    """Run the dry-run with the caches redirected into the repo, from a
    clean slate, so the shipped entries are exactly what it needs."""
    for sub in ("stages", "xla"):
        d = os.path.join(PREBAKED_DIR, sub)
        if os.path.isdir(d):
            shutil.rmtree(d)
        os.makedirs(d, exist_ok=True)
    env = dict(os.environ)
    env["VALIDA_TPU_STAGE_CACHE"] = os.path.join(PREBAKED_DIR, "stages")
    env["VALIDA_TPU_XLA_CACHE"] = os.path.join(PREBAKED_DIR, "xla")
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import __graft_entry__ as g; g.dryrun_multichip(%d); "
        "print('bake ok')" % (_REPO, n_devices)
    )
    subprocess.run([sys.executable, "-c", code], env=env, check=True)
    sizes = {}
    for sub in ("stages", "xla"):
        total = 0
        for root, _dirs, files in os.walk(os.path.join(PREBAKED_DIR, sub)):
            total += sum(os.path.getsize(os.path.join(root, f))
                         for f in files)
        sizes[sub] = total
    print("baked:", {k: f"{v/1e6:.1f}MB" for k, v in sizes.items()})


if __name__ == "__main__":
    bake(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
