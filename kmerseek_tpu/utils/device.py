"""Accelerator health probing and backend fallback.

The axon TPU tunnel in this environment can wedge indefinitely —
dispatches hang and the client ignores SIGTERM — so anything
user-facing probes the accelerator in a hard-killed subprocess first
and falls back to the CPU backend instead of hanging. Disable with
``KMERSEEK_NO_DEVICE_PROBE=1`` (e.g. on real, tunnel-free TPU hosts).
"""

from __future__ import annotations

import os
import subprocess
import sys


def device_healthy(deadline_s: int = 120) -> bool:
    """True iff a trivial op completes on the default accelerator."""
    code = "import jax, jax.numpy as jnp;print(float((jnp.ones((8,128))*2).sum()))"
    try:
        r = subprocess.run(
            ["timeout", "-k", "5", str(deadline_s), sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=deadline_s + 15,
        )
        return r.returncode == 0 and "2048" in r.stdout
    except Exception:
        return False


def enable_compilation_cache() -> None:
    """Persistent on-disk XLA compilation cache (amortizes the tunnel's
    minutes-long remote compiles across CLI invocations).

    Configured via env vars when jax is not imported yet — jax reads
    them at import — so CLI runs that stay on the native sketch fast
    path never pay the ~2.4 s jax import just to set cache config.
    When jax IS already loaded (e.g. the axon sitecustomize pre-imports
    it), the config is applied directly.

    The cache dir is additionally SEEDED from a pre-warmed artifact
    directory shipped with the checkout (``.jax_compile_cache/`` at the
    repo root) — the standard TPU-serving pattern of deploying compiled
    executables with the code so a fresh machine's first process skips
    the remote compiles for the production program shapes entirely
    (XLA falls back to a normal compile on any key mismatch)."""
    try:
        cache_dir = os.environ.get(
            "KMERSEEK_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "kmerseek_jax"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        _seed_compile_cache(cache_dir)
        if "jax" in sys.modules:
            import jax

            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
            # also export to the environment so SUBPROCESSES (bench
            # cold-start children, CLI re-invocations) share the cache
            os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
            os.environ.setdefault(
                "JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1"
            )
            os.environ.setdefault(
                "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5"
            )
        else:
            if "KMERSEEK_JAX_CACHE" in os.environ:
                # an explicit kmerseek cache dir must win over any
                # pre-existing JAX_COMPILATION_CACHE_DIR from the
                # ambient profile (jax.config.update used to enforce it)
                os.environ["JAX_COMPILATION_CACHE_DIR"] = cache_dir
            else:
                os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
            os.environ.setdefault(
                "JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1"
            )
            os.environ.setdefault(
                "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5"
            )
    except Exception:
        pass  # cache is an optimization; never fail over it


def _warm_cache_artifact_dir() -> str:
    """The pre-warmed compile-cache artifact directory of this checkout
    (may not exist). Overridable via KMERSEEK_WARM_CACHE_DIR."""
    if "KMERSEEK_WARM_CACHE_DIR" in os.environ:
        return os.environ["KMERSEEK_WARM_CACHE_DIR"]
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(os.path.dirname(pkg_root), ".jax_compile_cache")


def _seed_compile_cache(cache_dir: str) -> None:
    """Copy shipped ``*-cache`` executables into the live cache dir.

    Only fills holes — never overwrites an entry the local process
    already compiled (local entries are at least as fresh). Each copy
    is written to a temp file in ``cache_dir`` and ``os.rename``d into
    place (same pattern JAX's own cache writer uses): a concurrent
    process can never read a torn entry, and a lost rename race just
    means the other process's identical copy won. Plain copies, not
    hardlinks — a hardlink would share an inode with the checked-out
    artifact, so any in-place cache mutation would corrupt the repo
    working tree (ADVICE r4). Disable with KMERSEEK_NO_CACHE_SEED=1."""
    import shutil
    import tempfile

    if os.environ.get("KMERSEEK_NO_CACHE_SEED"):
        return
    src = _warm_cache_artifact_dir()
    if not os.path.isdir(src) or os.path.realpath(src) == os.path.realpath(
        cache_dir
    ):
        return
    for name in os.listdir(src):
        if not name.endswith("-cache"):
            continue
        dst = os.path.join(cache_dir, name)
        if os.path.exists(dst):
            continue
        try:
            fd, tmp = tempfile.mkstemp(prefix=".seed-", dir=cache_dir)
            try:
                with os.fdopen(fd, "wb") as out, open(
                    os.path.join(src, name), "rb"
                ) as inp:
                    shutil.copyfileobj(inp, out, 1 << 20)
                os.rename(tmp, dst)  # atomic; last writer wins, never torn
            except BaseException:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
                raise
        except Exception:
            pass  # seeding is best-effort


def ensure_usable_backend() -> str:
    """Fall back to CPU when the accelerator is unreachable.

    Also enables the persistent compilation cache. Returns the backend
    that will be used. No-op when the platform is already CPU or
    probing is disabled."""
    enable_compilation_cache()
    if os.environ.get("KMERSEEK_NO_DEVICE_PROBE"):
        return os.environ.get("JAX_PLATFORMS", "default")
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        return "cpu"
    if device_healthy():
        return os.environ.get("JAX_PLATFORMS", "default")
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    from .logging import logger

    logger.warning(
        "accelerator unreachable — falling back to the CPU backend"
    )
    return "cpu"
