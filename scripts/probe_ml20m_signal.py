"""Oracle probe of the ml20m fixture's attention-shaped signal.

VERDICT r4 next-#3: the r4 fixture gave even an oracle only ~+0.01
marginal AUC from the max-similarity (attention-shaped) signal, so DIN
could not beat MLP on it. This probe measures, WITHOUT training any
model, the AUC of three oracles on a generated fixture:

  * attention oracle — the full deterministic score (uses MAX cosine
    similarity vs the recent watches: what DIN's candidate-conditioned
    attention can compute);
  * pooled oracle    — same, but the item term sees only the MEAN
    similarity (what a mean-pooled behavior embedding exposes to
    MLP / YouTube-DNN);
  * no-item oracle   — drops the item-level term entirely.

Target: attention − pooled >= 0.02 (the reference's real-data DIN−MLP
gap is +0.019, README.md:17,33) while P(rating>3.5) stays ≈ 0.45.

  python scripts/probe_ml20m_signal.py --scale=0.05 \
      --set p_chain=0.5 --set beta_item=1.4 --set item_thr=0.5
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _arg(name, default):
    for a in sys.argv[1:]:
        if a.startswith(f"--{name}="):
            return a.split("=", 1)[1]
    return default


def _knob_overrides():
    out = {}
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--set" and i + 1 < len(argv):
            kk, v = argv[i + 1].split("=", 1)
            out[kk] = float(v)
        elif a.startswith("--set="):
            kk, v = a.split("=", 2)[1:]
            out[kk] = float(v)
    return out


def main():
    from goctr_tpu.core.metrics import roc_auc_score
    from goctr_tpu.data.ml20m import SignalKnobs, generate_ml20m_fixture

    scale = float(_arg("scale", "0.05"))
    ftypes = {f.name: f.type for f in dataclasses.fields(SignalKnobs)}
    kw = {k: (int(v) if ftypes.get(k) == "int" else v)
          for k, v in _knob_overrides().items()}
    knobs = SignalKnobs(**kw)
    with tempfile.TemporaryDirectory() as td:
        sig = os.path.join(td, "signals.npz")
        stats = generate_ml20m_fixture(
            os.path.join(td, "probe.db"), scale=scale, knobs=knobs,
            oversample=2.0 if scale < 0.2 else 1.25,
            debug_signals=sig)
        z = np.load(sig)
        y = (z["rating"] > 3.5).astype(np.float32)
        det_base = (z["b_u"] + z["quality"]
                    + knobs.alpha * (z["m_static"] - z["m_static"].mean())
                    + knobs.beta * (z["m_recent"] - z["m_recent"].mean()))
        m_item = z["m_item"]
        m_pool = np.clip((z["meansim"] - knobs.item_thr)
                         / (1.0 - knobs.item_thr), 0.0, 1.0)
        att = det_base + knobs.beta_item * (m_item - m_item.mean())
        pool = det_base + knobs.beta_item * (m_pool - m_pool.mean())
        aucs = {
            "attention_oracle": round(roc_auc_score(y, att), 5),
            "pooled_oracle": round(roc_auc_score(y, pool), 5),
            "no_item_oracle": round(roc_auc_score(y, det_base), 5),
        }
        gap = round(aucs["attention_oracle"] - aucs["pooled_oracle"], 5)
        print(json.dumps({
            "metric": "ml20m_signal_probe", "scale": scale,
            "aucs": aucs, "attention_minus_pooled": gap,
            "pos_rate": stats["pos_rate"],
            "m_item_mean": round(float(m_item.mean()), 4),
            "m_item_std": round(float(m_item.std()), 4),
            "knobs": dataclasses.asdict(knobs),
        }))


if __name__ == "__main__":
    main()
