"""Host-fed science loop with the SERVER ON THE REAL TPU (VERDICT r3 #5).

The reference's defining loop — an external stream landing on the host
and pushed through the accelerator continuously
(cpp/USRP_server_link_threads.cpp:604-702) — has on-chip evidence only
for synthesis/replay ingest; this runs the three-process science loop
(tools/science_producer.py -> gpu_sdr_tpu.server --ingest -> client
Packets_to_file -> VNA fit) with the server process on the TPU backend:
producer IQ crosses TCP to the server, each block crosses the relay
host->device link, the CHIRP demod runs on the chip, and results come
back over the data plane.  A MECHANISM proof, not a rate claim: this
rig's relay link runs at ~33 MB/s (a real TPU host link is O(10) GB/s),
so the stream rate is relay-capped at 1 Msps complex64 = 8 MB/s.

Artifacts: logs/science_vna_onchip.h5 (reference-layout H5 with the
recovered resonator fits) + the JSON summary this prints.

Run: nohup python tools/science_loop_onchip.py > logs/science_onchip.log 2>&1 &
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RATE = 1_000_000
RESOS = [dict(f0=-150_000.0, Qr=30.0, Qe_re=60.0),
         dict(f0=200_000.0, Qr=25.0, Qe_re=50.0)]


def spawn_server():
    # NO JAX_PLATFORMS override: the server process takes the axon TPU
    code = ("import jax; "
            "print('server backend:', jax.default_backend(), "
            "jax.devices(), flush=True); "
            "assert jax.default_backend() in ('tpu', 'axon'), "
            "'server must run on the TPU backend'; "
            "from gpu_sdr_tpu.server.main import main; import sys; "
            "sys.exit(main(['--async_port', '0', '--data_port', '0', "
            "'--ingest', '0', '--one_shot']))")
    proc = subprocess.Popen([sys.executable, "-c", code], cwd=REPO,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    deadline = time.monotonic() + 300
    line = backend = ""
    while time.monotonic() < deadline:
        line = proc.stdout.readline()
        if "server backend:" in line:
            backend = line.strip()
            print(json.dumps({"server_backend": backend}), flush=True)
        if "server ready" in line:
            break
        if proc.poll() is not None:
            raise RuntimeError(f"server died: {line}")
    assert "tpu" in backend.lower() or "axon" in backend.lower(), backend
    parts = line.replace(",", "").split()
    return (proc, int(parts[parts.index("async") + 2]),
            int(parts[parts.index("data") + 2]))


def main():
    os.chdir(REPO)
    import jax
    jax.config.update("jax_platforms", "cpu")   # client side stays CPU
    from gpu_sdr_tpu.client import connections as Uconn
    from gpu_sdr_tpu.client import delay as Udelay
    from gpu_sdr_tpu.client import files as Ufiles
    from gpu_sdr_tpu.client import fitting as Ufit
    from gpu_sdr_tpu.client import vna as Uvna

    Udelay.set_line_delay(RATE, 512e-6 * 1e9)
    server = producer = conn = None
    t_all = time.perf_counter()
    try:
        server, a_port, d_port = spawn_server()
        print(json.dumps({"server_ready_s":
                          round(time.perf_counter() - t_all, 1),
                          "async_port": a_port, "data_port": d_port}),
              flush=True)
        cmd = Uvna.compose_vna_command(
            start_f=-400_000, last_f=400_000, measure_t=0.4,
            n_points=1600, tx_gain=0, Rate=RATE, RF=10_000_000)
        cmd_path = os.path.join("logs", "onchip_cmd.json")
        with open(cmd_path, "w") as f:
            f.write(cmd.to_json())
        portfile = os.path.join("logs", "onchip_ingest_port.txt")
        if os.path.exists(portfile):
            os.remove(portfile)
        producer = subprocess.Popen(
            [sys.executable, os.path.join("tools", "science_producer.py"),
             "--params", cmd_path, "--portfile", portfile,
             "--resonators", json.dumps(RESOS),
             "--fft_len", str(1 << 12), "--wait_s", "600"],
            cwd=REPO, env=dict(os.environ, JAX_PLATFORMS="cpu"),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)

        conn = Uconn.Connection(host="127.0.0.1", async_port=a_port,
                                sync_port=d_port)
        conn.send_params(cmd)
        deadline = time.monotonic() + 600    # remote compile headroom
        while conn.ingest_port is None:
            assert time.monotonic() < deadline, "no ingest port announced"
            time.sleep(0.05)
        with open(portfile, "w") as f:
            f.write(str(conn.ingest_port))
        t0 = time.perf_counter()
        fn = Uconn.Packets_to_file(conn, cmd, filename="logs/science_vna_onchip",
                                   meas_type="VNA", progress=False)
        stream_s = time.perf_counter() - t0
        out, _ = producer.communicate(timeout=600)
        assert producer.returncode == 0, out[-2000:]
        assert "producer done" in out
        n_samples = int(0.4 * RATE)
        print(json.dumps({
            "stream_s": round(stream_s, 1),
            "samples": n_samples,
            "relay_capped_msps": round(n_samples / stream_s / 1e6, 3),
        }), flush=True)
    finally:
        Udelay.LINE_DELAY.clear()
        if conn is not None:
            conn.close()
        for p in (producer, server):
            if p is not None and p.poll() is None:
                p.kill()

    Uvna.VNA_analysis(fn)
    assert Ufiles.is_VNA_analyzed(fn)
    ok = Ufit.initialize_peaks(fn, N_peaks=2, peak_width=50e3,
                               Qr_cutoff=5, Mag_depth_cutoff=0.5,
                               exclude_center=False)
    assert ok, "peak init failed"
    assert Ufit.vna_fit(fn, fit_range=60e3)
    params = Ufit.get_fit_param(fn)
    f0s = sorted(1e6 * p["f0"] for p in params)
    expect = sorted(10_000_000 + r["f0"] for r in RESOS)
    errs = [abs(got - exp) for got, exp in zip(f0s, expect)]
    print(json.dumps({
        "h5": fn,
        "recovered_f0_hz": [round(f, 1) for f in f0s],
        "expected_f0_hz": expect,
        "f0_error_hz": [round(e, 1) for e in errs],
        "Qr": [round(float(p["Qr"]), 2) for p in params],
        "ok": all(e < 10_000 for e in errs),
    }), flush=True)


if __name__ == "__main__":
    main()
