"""One-shot TPU measurement session: runs every probe that needs the real
chip, in sequence, appending results to benchmarks/tpu_session_results.txt.

    timeout 3000 python benchmarks/tpu_session.py [stage ...]

Stages (default: all):
    parity   — pallas_marginal_probe small: kernel-variant parity on TPU
    stages   — gibbsish sub-stage breakdown at 10k x 5k
    scale    — per-branch ROOFLINE table at 10k x 5k (pallas on/off)
    chains   — south_america headline chain-count sweep (256..4096)
    bench    — the headline bench.py measurement

Run ONE at a time over the axon tunnel (serializes TPU jobs; each stage
forks a subprocess so a tunnel hang only loses that stage).
"""
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
OUT = ROOT / "benchmarks" / "tpu_session_results.txt"

STAGES = {
    "parity": [sys.executable, "benchmarks/pallas_marginal_probe.py", "small"],
    "stages": [sys.executable, "benchmarks/pallas_marginal_probe.py", "stages"],
    "scale": [sys.executable, "benchmarks/pallas_marginal_probe.py", "scale"],
    "chains": [sys.executable, "benchmarks/chain_sweep.py"],
    "geo": [sys.executable, "benchmarks/geo_probe.py"],
    "widecap": [sys.executable, "benchmarks/wide_cap_probe.py"],
    "bench": [sys.executable, "bench.py"],
}
STAGE_ENV = {
    # idx layout is default-on (parity/stages cover it); *_onehot stages
    # opt back out to measure the one-hot fallback path
    "parity_onehot": {"SBAYES_TPU_PALLAS_IDX": "0"},
    "stages_onehot": {"SBAYES_TPU_PALLAS_IDX": "0"},
}
STAGES["parity_onehot"] = STAGES["parity"]
STAGES["stages_onehot"] = STAGES["stages"]
TIMEOUTS = {"parity": 900, "parity_onehot": 900,
            "stages": 1200, "stages_onehot": 1200,
            "scale": 1500, "chains": 1800, "geo": 1200, "widecap": 1500,
            "bench": 2400}


def main():
    names = sys.argv[1:] or list(STAGES)
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache_tpu"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    with OUT.open("a") as f:
        f.write(f"\n===== session {time.strftime('%Y-%m-%d %H:%M:%S')} =====\n")
    for name in names:
        cmd = STAGES[name]
        stage_env = {**env, **STAGE_ENV.get(name, {})}
        print(f"--- stage {name}: {' '.join(cmd)}", flush=True)
        t0 = time.time()
        try:
            p = subprocess.run(cmd, cwd=ROOT, env=stage_env, capture_output=True,
                               text=True, timeout=TIMEOUTS[name])
            status = f"rc={p.returncode}"
            body = p.stdout + ("\n[stderr]\n" + p.stderr if p.returncode else "")
        except subprocess.TimeoutExpired as e:
            # on timeout stdout/stderr are BYTES (no text decoding happened)
            status = "TIMEOUT"

            def _s(x):
                return x.decode(errors="replace") if isinstance(x, bytes) else (x or "")

            body = _s(e.stdout) + "\n[stderr]\n" + _s(e.stderr)
        wall = time.time() - t0
        with OUT.open("a") as f:
            f.write(f"\n--- {name} ({status}, {wall:.0f}s)\n{body}\n")
        print(f"--- stage {name}: {status} in {wall:.0f}s", flush=True)


if __name__ == "__main__":
    main()
