"""C ABI (native/cpcodec.cpp): build the shim and run its C test program.

The reference ships pco_c with a C test (ref: pco_c/test/test_cpcodec.c);
this mirrors that structure over the embedded-interpreter shim.
"""

import os
import shutil
import subprocess
import sys
import sysconfig

import pytest

NATIVE = os.path.join(os.path.dirname(__file__), "..", "pcodec_tpu", "native")


@pytest.mark.skipif(
    shutil.which("g++") is None or shutil.which("gcc") is None,
    reason="no C toolchain",
)
def test_c_abi_round_trip(tmp_path):
    inc = sysconfig.get_paths()["include"]
    libdir = sysconfig.get_config_var("LIBDIR")
    pyver = f"python{sys.version_info.major}.{sys.version_info.minor}"
    so = tmp_path / "libcpcodec.so"
    exe = tmp_path / "test_cpcodec"
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", os.path.join(NATIVE, "cpcodec.cpp"),
         f"-I{inc}", "-o", str(so), f"-L{libdir}", f"-l{pyver}", "-ldl", "-lm"],
        check=True, capture_output=True)
    subprocess.run(
        ["gcc", os.path.join(NATIVE, "test_cpcodec.c"), f"-L{tmp_path}",
         "-lcpcodec", f"-Wl,-rpath,{tmp_path}", f"-I{NATIVE}", "-o", str(exe)],
        check=True, capture_output=True)
    env = dict(os.environ)
    repo = os.path.abspath(os.path.join(NATIVE, "..", ".."))
    site = next(p for p in sys.path if p.endswith("site-packages"))
    env["PYTHONPATH"] = f"{repo}:{site}"
    r = subprocess.run([str(exe)], env=env, capture_output=True, text=True, timeout=240)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "ALL C ABI TESTS PASSED" in r.stdout


def test_jni_shim_compiles():
    """The Java JNI shim must stay well-formed C++ (no JDK here: checked
    against the vendored spec-declaration stub, java/jni_stub/jni.h)."""
    import subprocess, os
    d = os.path.join(os.path.dirname(__file__), "..", "pcodec_tpu", "java")
    r = subprocess.run(["make", "syntax-check"], cwd=d, capture_output=True)
    assert r.returncode == 0, r.stderr.decode()
