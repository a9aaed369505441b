"""HostMeter (bench.py): the steal/other-busy evidence recorded in the
bench artifact must actually move under deliberate load (VERDICT r7 #2 —
"a deliberately loaded A/B shows it moving")."""

import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

# built at runtime so pkill -f can never match this test process itself
SPIN_CODE = "while " + "True: pass"


def test_meter_quiet_vs_loaded():
    m = bench.HostMeter()
    m.start()
    time.sleep(0.8)
    quiet = m.stop()
    procs = [
        subprocess.Popen(
            ["setsid", sys.executable, "-c", SPIN_CODE],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            start_new_session=True)
        for _ in range(4)
    ]
    try:
        time.sleep(0.3)
        m.start()
        time.sleep(0.8)
        loaded = m.stop()
    finally:
        subprocess.run(["pkill", "-f", SPIN_CODE], check=False)
    # 4 out-of-tree spinners on this host = ~12.5% of 32 CPUs; require a
    # clear move with slack for whatever else the host is doing
    assert loaded["other_busy_pct"] >= quiet["other_busy_pct"] + 5.0, (
        quiet, loaded)
    for d in (quiet, loaded):
        assert set(d) == {"steal_pct", "other_busy_pct", "busy_pct"}
        for v in d.values():
            assert 0.0 <= v <= 100.0


def test_tree_cpu_attribution():
    """A spinner that IS our child must not count as other-busy."""
    m = bench.HostMeter()
    p = subprocess.Popen([sys.executable, "-c", SPIN_CODE],
                         stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        time.sleep(0.3)
        m.start()
        time.sleep(0.8)
        out = m.stop()
    finally:
        p.kill()
        p.wait()
    # one in-tree spinner = ~3.1% busy, nearly all attributed to our tree
    assert out["busy_pct"] >= 2.0, out
    assert out["other_busy_pct"] <= out["busy_pct"] / 2 + 1.0, out
