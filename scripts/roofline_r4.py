"""Roofline / MFU accounting for the two headline paths (VERDICT r3
weak #2: ground 'fast' in chip utilization, not just ratios to an
estimated baseline).

Analytic FLOP/byte counts from the code's actual tensor shapes:

1. One GNN-MPC optimize iteration at the bench point (S=1920 = 64
   samples x 30 hypotheses, N=100, K=10, nf=64, pstep=3, n_act=1,
   fwd + bwd), models/gnn_dyn.py PropNetDiffDen.__call__.
2. One 19.3k-particle sim frame at the 8192-row active-set tier
   (sim/pbd.py sorted-window contacts, W=5 tiles, 12 iterations x 2
   substeps), the datagen push workload.

With --measure, times both on the current device (idle chip required
for clean numbers) and prints MFU / HBM utilization against TPU v5e
peaks (197 TFLOP/s bf16, ~49 TFLOP/s f32-highest, 819 GB/s HBM).

Bandwidth is reported for two fusion scenarios because XLA may or may
not materialize the (S, N*K, N) one-hot relation tensor per einsum:
'materialized' counts one HBM read of R per einsum consumer,
'fused' counts R as generated on the fly in VMEM (iota-compare inside
the matmul tiles). Reality sits between; the measured ms pins it.
"""
import argparse
import json

V5E_BF16 = 197e12
V5E_F32 = 49e12          # HIGHEST-precision (6-pass) matmul estimate
V5E_HBM = 819e9

GB = 1e9


def mpc_iter_model(S=1920, N=100, K=10, nf=64, n_act=1, M=500, rank=64):
    """FLOPs/bytes for ONE optimize iteration (fwd + bwd ~= 3x fwd)."""
    E = S * N * K                       # edges
    # one-hot gather einsums (B, N*K, N) @ (B, N, F):
    ein = lambda F: 2.0 * S * (N * K) * N * F
    fwd = 0.0
    fwd += ein(1) * 2        # a_s exact hi/lo
    fwd += ein(3) * 2        # s_s exact hi/lo
    fwd += ein(1)            # edge_w mask gather
    fwd += ein(nf) * 3       # pstep sender gathers
    # MLPs (per-edge / per-particle dense layers)
    fwd += 2.0 * E * (6 * nf + nf * nf + nf * nf)    # relation encoder
    fwd += 2.0 * E * nf * nf                          # rel_base @ w_re
    fwd += 3 * (2.0 * S * N * nf * nf) * 2            # pe_r, pe_s matmuls
    fwd += 3 * (2.0 * S * N * (2 * nf + 1) * nf)      # particle propagator
    fwd += 2.0 * S * N * (5 * nf + nf * nf + nf * 3)  # encoder+predictor
    # graph build: pairwise d2 (S, N, N) + top_k
    fwd += 2.0 * S * N * N * 3
    # reward (fast path): rank-R field two-hot matmuls + coverage einsum
    fwd += 2.0 * S * N * rank * 2 + 2.0 * S * N * M
    flops = 3.0 * fwd * n_act           # bwd ~= 2x fwd

    bf16 = 2
    r_bytes = S * (N * K) * N * bf16    # the (S, N*K, N) one-hot tensor
    acts_bytes = (
        E * nf * bf16 * 6               # per-edge activations (enc x3,
                                        # rel_base, effect_rel, grads)
        + S * N * nf * bf16 * 8         # per-particle effects + grads
    )
    consumers = 2 + 2 + 1 + 3           # einsum reads of R (see above)
    bytes_mat = (consumers * r_bytes * 3 + acts_bytes * 3) * n_act
    bytes_fused = acts_bytes * 3 * n_act
    return flops, bytes_mat, bytes_fused


def sim_frame_model(A=8192, TILE=128, W=5, iters=12, substeps=2,
                    inner=2, n_full=19456):
    """FLOPs/bytes for one push frame at the 8192-row prefix tier.
    Contacts: (A/TILE, TILE, W*TILE) pair tensors, f32 on the VPU."""
    pairs = A * (W * TILE)              # pair slots per sweep
    sweeps = iters * substeps * inner
    flops_pair = 40.0                   # diff, d2, rsqrt, proj, friction
    flops = pairs * sweeps * flops_pair
    # shape matching: per-group 3x3 accumulations ~ O(A * 30) per iter
    flops += A * 30.0 * iters * substeps
    f32 = 4
    bytes_per_sweep = pairs * (3 + 1) * f32 + A * 3 * f32 * 4
    hbm = bytes_per_sweep * sweeps      # upper bound: no VMEM residency
    hbm_pallas = A * 3 * f32 * 8 * substeps * iters  # VMEM-resident kernel
    return flops, hbm, hbm_pallas


def report(tag, flops, byt, ms, peak_flops):
    mfu = flops / (ms * 1e-3) / peak_flops * 100
    bw = byt / (ms * 1e-3) / V5E_HBM * 100
    print(f"{tag}: {ms:.2f} ms  {flops/1e9:.1f} GFLOP -> MFU {mfu:.1f}%  "
          f"{byt/GB:.2f} GB -> HBM {bw:.1f}%")
    return {"ms": ms, "gflop": flops / 1e9, "mfu_pct": mfu,
            "gbytes": byt / GB, "hbm_pct": bw}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", action="store_true")
    args = ap.parse_args()

    flops_i, b_mat, b_fus = mpc_iter_model()
    print("== MPC optimize iteration (S=1920, N=100, fwd+bwd) ==")
    print(f"analytic: {flops_i/1e9:.1f} GFLOP, "
          f"{b_mat/GB:.2f} GB (R materialized) / {b_fus/GB:.2f} GB (fused)")
    print(f"ideal: compute {flops_i/V5E_BF16*1e3:.2f} ms (bf16 peak), "
          f"bandwidth {b_mat/V5E_HBM*1e3:.2f} / {b_fus/V5E_HBM*1e3:.2f} ms")

    flops_s, hbm_s, hbm_p = sim_frame_model()
    print("== sim push frame (19.3k particles, 8192 tier) ==")
    print(f"analytic: {flops_s/1e9:.2f} GFLOP (VPU f32), "
          f"{hbm_s/GB:.2f} GB (XLA windows) / {hbm_p/GB:.3f} GB (Pallas "
          f"VMEM-resident)")
    print(f"ideal: bandwidth {hbm_s/V5E_HBM*1e3:.2f} ms / "
          f"{hbm_p/V5E_HBM*1e3:.3f} ms")

    if not args.measure:
        return

    # ---- measured ----
    import sys
    sys.path.insert(0, ".")
    out = {}
    import bench
    ms_iter = bench.measure_mpc_ms_per_iter()
    out["mpc_iter"] = report("MPC iter (measured)", flops_i,
                             b_mat, ms_iter, V5E_BF16)
    ms_frame = bench.measure_push_ms_per_frame()
    out["sim_frame"] = report("sim frame (measured)", flops_s,
                              hbm_s, ms_frame, V5E_F32)
    with open("logs/roofline_r4.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
