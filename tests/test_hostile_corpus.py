"""Hostile-input hardening gate for the native TIFF reader.

Drives ``tests/hostile_corpus.py`` (the malformed-TIFF corpus) in a
subprocess so that a native crash in ``tiffreader.cpp`` shows up as a
nonzero/negative exit code instead of killing pytest.  This is the
rebuild's answer to the reference's reliance on OpenSlide's
battle-tested decode (``patch_gen_hdf5.py:68,108``): our first-party
C++ reader must turn every malformed input into a Python-level error.

Two tiers:

* quick — corpus under the production ``libsequoia_native.so``.
* slow  — corpus under a ``-fsanitize=address,undefined`` build
  (``make -C sequoia_tpu/native asan``) with libasan/libubsan
  LD_PRELOADed, so UB and heap corruption that happen not to crash are
  still caught.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

native = pytest.importorskip("sequoia_tpu.native")
if not native.available():
    pytest.skip("native library not built", allow_module_level=True)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS_SCRIPT = os.path.join(REPO, "tests", "hostile_corpus.py")
NATIVE_DIR = os.path.join(REPO, "sequoia_tpu", "native")


def _run_corpus(tmp_path, extra_args=(), env_extra=None):
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    proc = subprocess.run(
        [sys.executable, CORPUS_SCRIPT, str(tmp_path / "corpus"), "--build",
         *extra_args],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    return proc


def _check(proc):
    # Negative returncode == died on a signal (segfault/abort) — the one
    # outcome this gate exists to forbid.
    assert proc.returncode >= 0, (
        f"native reader crashed on hostile input (signal "
        f"{-proc.returncode}):\n{proc.stderr[-4000:]}")
    assert proc.returncode == 0, (
        f"corpus runner failed (rc={proc.returncode}):\n"
        f"{proc.stdout[-2000:]}\n{proc.stderr[-4000:]}")
    results = json.loads(proc.stdout)
    # The valid fixture must remain fully functional (no over-hardening).
    assert results["valid"] == "read_ok,batch_ok,ycbcr_ok", results["valid"]
    # Structurally unreadable files must be refused at open, not limped
    # through.
    for name in ("empty", "garbage", "short_header", "header_only",
                 "trunc_10", "trunc_50", "trunc_90",
                 "ifd_offset_beyond_eof", "tile_dims_huge",
                 "image_dims_huge"):
        assert results.get(name) == "open_refused", (name, results.get(name))
    # Every case produced an outcome label — and every refusal used the
    # reader's contractual exception type (OSError); a *_error:Type label
    # means some OTHER exception escaped a read surface.
    for name, outcome in results.items():
        assert not outcome.startswith("open_error:"), (name, outcome)
        assert "_error:" not in outcome, (name, outcome)
    return results


def test_hostile_corpus_no_crash(tmp_path):
    """All ~35 malformed TIFFs open/read/refuse cleanly, no process death."""
    _check(_run_corpus(tmp_path))


def _sanitizer_libs():
    libs = []
    for name in ("libasan.so", "libubsan.so"):
        out = subprocess.run(["g++", f"-print-file-name={name}"],
                             capture_output=True, text=True)
        path = out.stdout.strip()
        if not path or not os.path.isabs(path) or not os.path.exists(path):
            return None
        libs.append(path)
    return libs


@pytest.mark.slow
def test_hostile_corpus_asan_ubsan(tmp_path):
    """Corpus under ASAN+UBSAN: no heap errors, no UB, no leaks-at-crash."""
    if shutil.which("g++") is None:
        pytest.skip("no g++ toolchain")
    libs = _sanitizer_libs()
    if libs is None:
        pytest.skip("libasan/libubsan not installed")
    build = subprocess.run(["make", "-C", NATIVE_DIR, "asan"],
                           capture_output=True, text=True, timeout=300)
    if build.returncode != 0:
        pytest.skip(f"asan build failed: {build.stderr[-500:]}")
    asan_so = os.path.join(NATIVE_DIR, "libsequoia_native_asan.so")
    _check(_run_corpus(
        tmp_path, extra_args=["--lib", asan_so],
        env_extra={
            "LD_PRELOAD": ":".join(libs),
            # abort (caught as negative rc) rather than exit-1 on report,
            # so a sanitizer finding is unambiguous vs a runner failure
            "ASAN_OPTIONS": "detect_leaks=0,abort_on_error=1",
            "UBSAN_OPTIONS": "halt_on_error=1",
        }))
