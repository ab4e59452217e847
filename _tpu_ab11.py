"""Follow-up to _tpu_ab10.py (scratch, not part of the package).

ab10 found: baseline 35.64, BB_FUSED 35.27 (reject), AE_STEM 35.85
(marginal +0.21), FOLD skipped on a probe failure that turns out to be
irrelevant — the only failing probe case was a bf16 lane roll
(transient HTTP 500 from the remote compiler), and _kernel_fold rolls
exclusively f32 arrays (compute: v1/u2 casts; finalize: ytw f32).

This queue: UPSHEAD_FOLD single, then confirmation re-runs of baseline
and AE_STEM (the delta is within possible relay variance), then the
winning combo if both survive.

Run: nohup python _tpu_ab11.py > /tmp/ab11.out 2>&1 &  echo $! > /tmp/ab11.pid
"""

from __future__ import annotations

import importlib.util
import sys

spec = importlib.util.spec_from_file_location("_tpu_ab10", "_tpu_ab10.py")
ab10 = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ab10)
run_bench, log = ab10.run_bench, ab10.log


def main():
    fold = run_bench("UPSHEAD_FOLD", {"DVIE_UPSHEAD_FOLD": "1"})
    base2 = run_bench("BASELINE_rerun", {})
    stem2 = run_bench("AE_STEM_rerun", {"DVIE_AE_STEM": "1"})
    log(f"fold={fold} base2={base2} stem2={stem2} "
        f"(ab10: base=35.64 stem=35.85 bb=35.27)")
    combo = {}
    if fold is not None and base2 is not None and fold > base2 + 0.15:
        combo["DVIE_UPSHEAD_FOLD"] = "1"
    if stem2 is not None and base2 is not None and stem2 > base2 + 0.15:
        combo["DVIE_AE_STEM"] = "1"
    if len(combo) >= 2:
        run_bench(f"COMBO {sorted(combo)}", combo)
    log("=== AB11_COMPLETE ===")


if __name__ == "__main__":
    main()
