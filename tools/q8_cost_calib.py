"""Cost-model calibration vs the measured queue-38/39 kernel table.

Evaluates ops/q8_matmul's bytes-equivalent strategy scores (ws / rs /
int8ws) at the seven DiT linear shapes and compares the predicted
ranking and latency (score / 810 GB/s) against the hardware numbers in
docs/BENCH.md (queue #38, with the queue-39 flux-dn re-measures).  Run
on CPU — the model is pure arithmetic:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/q8_cost_calib.py

The check: argmin(model) must match argmin(measured) per shape (modulo
entries flagged unstable by the queue-40 repeat A/B).  Constants being
calibrated: _WS_FLOP_PER_BYTE, _INT8_MXU_GAIN, _INT8_QUANT_EQ.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mlimgsynth_tpu.ops import q8_matmul as q8  # noqa: E402

HBM_GBPS = 810.0

# (tag, m, k, n) -> measured ms (docs/BENCH.md queue #38; flux-dn ws/rs
# from queue #39 which supersedes 38's bimodal sample)
MEASURED = [
    ("sd35L-qkv",    8500, 2432, 7296,
     {"default": 3.995, "ws": 3.600, "rs": 3.489, "int8ws": 3.041}),
    ("sd35L-out",    8500, 2432, 2432,
     {"default": 2.116, "ws": 1.867, "rs": 1.846, "int8ws": 1.752}),
    ("sd35L-mlp-up", 8500, 2432, 9728,
     {"default": 3.995, "ws": 3.729, "rs": 4.112, "int8ws": 3.009}),
    ("sd35L-mlp-dn", 8500, 9728, 2432,
     {"default": 9.212, "ws": 4.722, "rs": 4.485, "int8ws": 5.097}),
    ("flux-qkv",     4608, 3072, 9216,
     {"default": 3.399, "ws": 2.900, "rs": 4.849, "int8ws": 2.785}),
    ("flux-mlp-up",  4608, 3072, 12288,
     {"default": 3.728, "ws": 3.400, "rs": 5.838, "int8ws": 2.597}),
    # ws at flux-dn is BIMODAL across queues (3.54/7.20/9.91); rs is the
    # stable strategy there (4.61/3.47).  int8ws 4.048 is a single
    # sample on the same unstable (n,m) grid — treat as unconfirmed
    # until the queue-40 repeat A/B.
    ("flux-mlp-dn",  4608, 12288, 3072,
     {"default": 7.389, "ws": 9.911, "rs": 3.469, "int8ws": 4.048}),
]

UNSTABLE = {("flux-mlp-dn", "int8ws"), ("flux-mlp-dn", "ws")}


def model_ms(m, k, n):
    out = {}
    wsp = q8._plan_ws(m, k, n, 2, 2)
    if wsp:
        out["ws"] = wsp[-1] / HBM_GBPS / 1e6
    rsp = q8._plan_rs(m, k, n, 2, 2)
    if rsp:
        out["rs"] = rsp[-1] / HBM_GBPS / 1e6
    i8p = q8._plan_ws(m, k, n, 2, 2, temp_bytes=6, int8=True)
    if i8p:
        out["int8ws"] = i8p[-1] / HBM_GBPS / 1e6
    return out


def main():
    ok = True
    hdr = f"{'shape':14s} {'strat':7s} {'meas':>7s} {'model':>7s}"
    print(hdr)
    for tag, m, k, n, meas in MEASURED:
        pred = model_ms(m, k, n)
        stable = {s: v for s, v in meas.items()
                  if s in pred and (tag, s) not in UNSTABLE}
        best_meas = min(stable, key=stable.get)
        best_pred = min(pred, key=pred.get)
        for s in ("ws", "rs", "int8ws"):
            if s in pred:
                mark = ""
                if s == best_meas:
                    mark += " <-meas"
                if s == best_pred:
                    mark += " <-model"
                print(f"{tag:14s} {s:7s} {meas.get(s, float('nan')):7.3f} "
                      f"{pred[s]:7.3f}{mark}")
        agree = best_pred == best_meas or (tag, best_pred) in UNSTABLE
        if not agree:
            # picking an unstable-but-possibly-better strategy is noted,
            # picking a measured-loser over the measured winner fails
            print(f"  MISMATCH at {tag}: model {best_pred} "
                  f"vs measured {best_meas}")
            ok = False
    # the storage-eligibility gate should mirror the per-shape winners
    os.environ.setdefault("MLIS_Q8_INT8WS", "auto")
    for tag, m, k, n, meas in MEASURED:
        el = q8.percol_eligible(k, n, m_hint=m)
        stable = {s: v for s, v in meas.items()
                  if s != "default" and (tag, s) not in UNSTABLE}
        want = min(stable, key=stable.get) == "int8ws"
        flag = "ok" if el == want else "DIFF"
        print(f"percol_eligible({tag}) = {el} (measured-best int8ws: "
              f"{want}) {flag}")
    print("CALIBRATION", "OK" if ok else "FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
