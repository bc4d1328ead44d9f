"""Native C API: build libtfhe_tpu_capi.so and run the C client program
against it (reference: tfhe/c_api_tests/test_high_level_integers.c built by
CMake and run via scripts/c_api_tests.sh)."""
import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_c_client_high_level_integers(tmp_path):
    from tfhe_tpu import native

    so = native.build_capi()
    src = REPO / "tests" / "c_api" / "test_high_level_integers.c"
    binary = tmp_path / "test_high_level_integers"
    subprocess.run(
        ["g++", "-O2", str(src), f"-I{so.parent / 'include'}",
         f"-L{so.parent}", f"-Wl,-rpath,{so.parent}", "-ltfhe_tpu_capi",
         "-o", str(binary)],
        check=True, capture_output=True)

    env = dict(os.environ,
               PALLAS_AXON_POOL_IPS="",   # force CPU (conftest pattern)
               JAX_PLATFORMS="cpu",
               PYTHONPATH=str(REPO))
    res = subprocess.run([str(binary)], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=1200)
    assert res.returncode == 0, (res.stdout, res.stderr)
    assert "PASS" in res.stdout
