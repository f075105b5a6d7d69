"""bench.py must emit its single JSON line even when killed mid-run.

Round-3 lesson: the driver's timeout killed bench.py before it printed
anything, so the round recorded no numbers (BENCH_r03.json rc=124). These
tests pin the guard machinery without touching a device: the SIGTERM
handler and the watchdog deadline must both produce one parseable JSON
line on stdout, flagged as incomplete/partial.
"""
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code, timeout=60, sig=None, sig_after=None):
    p = subprocess.Popen(
        [sys.executable, "-c", code], cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    if sig is not None:
        time.sleep(sig_after)
        p.send_signal(sig)
    out, err = p.communicate(timeout=timeout)
    return out.decode(), err.decode(), p.returncode


def test_emit_on_deadline():
    out, err, rc = _run(
        "import os\n"
        "os.environ['PCODEC_BENCH_DEADLINE_S'] = '2'\n"
        "import bench\n"
        "bench._install_guards()\n"
        "import time\n"
        "bench.RESULT['value'] = 1.23\n"
        "time.sleep(30)\n",
        timeout=60,
    )
    lines = [l for l in out.splitlines() if l.strip()]
    assert len(lines) == 1, (out, err)
    d = json.loads(lines[0])
    assert d["metric"] == "container_decode_taxi_like_i64"
    assert d["value"] == 1.23
    assert d["extra"]["partial"] == "deadline"


def test_emit_on_sigterm():
    out, err, rc = _run(
        "import bench\n"
        "bench._install_guards()\n"
        "import time\n"
        "time.sleep(60)\n",
        timeout=60, sig=signal.SIGTERM, sig_after=5,
    )
    lines = [l for l in out.splitlines() if l.strip()]
    assert len(lines) == 1, (out, err)
    d = json.loads(lines[0])
    # value never set -> flagged incomplete, still one parseable line
    assert d["value"] == 0.0
    assert "incomplete" in d["extra"]


def test_single_line_on_double_kill():
    out, err, rc = _run(
        "import os\n"
        "os.environ['PCODEC_BENCH_DEADLINE_S'] = '2'\n"
        "import bench\n"
        "bench._install_guards()\n"
        "import time\n"
        "bench.RESULT['value'] = 9.9\n"
        "time.sleep(30)\n",
        timeout=60, sig=signal.SIGTERM, sig_after=4,
    )
    lines = [l for l in out.splitlines() if l.strip()]
    assert len(lines) == 1, (out, err)
