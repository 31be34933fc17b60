"""Idle-chip recapture of the dynamic-serving tax rows (BASELINE round 4).

Runs the subset of `bench.py --all` lines that were missing or CPU-skewed
in the round-4 full capture (the harness session died mid-run and a
concurrent lutft job loaded the 1-core host):

  * lerf_g_lut_sr_dynamic_scale_latency_p50     (missing)
  * lerf_g_lut_warp_x4_batch4_..._throughput    (missing)
  * lerf_g_train_step_throughput                (skewed: 21 vs 839 /s)
  * 4K ×3.55 gather vs rings                    (new BASELINE row)
  * ×0.5 anti-aliased downscale rings           (new round-4 serving form)

Usage: python tools/exp_dynamic_tax.py [--skip-train] [--skip-4k]
Emits the same one-line JSON records as bench.py.  Run on an IDLE machine
only — host contention skews the latency and train lines.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-4k", action="store_true")
    args = ap.parse_args()

    bench._wait_for_tpu()
    from lerf_tpu.config import enable_jit_cache
    enable_jit_cache()
    s1, s2 = bench.load_luts()

    p50, nscales = bench.bench_sr_dynamic(bench.LR_H, bench.LR_W)
    bench.emit("lerf_g_lut_sr_dynamic_scale_latency_p50", p50,
               unit=f"ms_across_{nscales}_scales_bucket_programs")
    bench.emit("lerf_g_lut_warp_x4_batch4_distinct_matrices_throughput",
               bench.bench_warp_batch(bench.LR_H, bench.LR_W),
               bench.REF_NUMPY_WARP_MPS)
    bench.emit("lerf_g_lut_sr_x0.5_aa_rings_throughput",
               bench.bench_lut_sr_rings(s1, s2, 1440, 2560, 0.5),
               bench.REF_NUMPY_MPS)
    if not args.skip_4k:
        bench.emit("lerf_g_lut_sr_4k_x3.55_gather_throughput",
                   bench.bench_lut_sr(s1, s2, 720, 1280, scale=3.55),
                   bench.REF_NUMPY_MPS)
        bench.emit("lerf_g_lut_sr_4k_x3.55_rings_throughput",
                   bench.bench_lut_sr_rings(s1, s2, 720, 1280, 3.55),
                   bench.REF_NUMPY_MPS)
    if not args.skip_train:
        # fresh process: after the 4K serving benches have run, the same
        # in-process bench_train measures ~21 steps/s instead of ~860
        # (allocator/fragmentation state from the multi-GB serving
        # buffers) — verified 2026-08-21 by running it alone at HEAD
        # (861/s) and at three historical commits (736-935/s)
        import subprocess
        out = subprocess.run(
            [sys.executable, "-c",
             "import bench; from lerf_tpu.config import enable_jit_cache;"
             "enable_jit_cache();"
             "print('RESULT', bench.bench_train())"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True, timeout=1800)
        val = [ln for ln in out.stdout.splitlines()
               if ln.startswith("RESULT ")]
        if not val:
            raise RuntimeError(f"train bench failed: {out.stderr[-500:]}")
        bench.emit("lerf_g_train_step_throughput",
                   float(val[0].split()[1]), unit="train_steps_per_sec")


if __name__ == "__main__":
    main()
