"""Model persistence.

Two tiers (upgrading the reference's weights-only JSON snapshots,
SURVEY.md §5 checkpoint note):

1. **Reference-compatible JSON** — exact field schema of the reference's
   DIN (din.go:41-52) / YouTube-DNN (dnn.go:38-47) marshals, so weights can
   round-trip with go-ctr model files. Row-major flat float lists; only
   emitted when the model has no biases (the reference has none).
2. **Full checkpoints** — params + optimizer state + model config as
   npz + JSON sidecar, supporting true mid-training resume (absent in the
   reference).
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

from goctr_tpu.models.base import SampleInfo
from goctr_tpu.models.din import DIN
from goctr_tpu.models.trainer import TrainedRanker, _make_predict_fn
from goctr_tpu.models.youtube_dnn import YoutubeDNN


# ----------------------------------------------------- reference JSON tier ---

def din_to_json(model: DIN, params: dict) -> str:
    d = {
        "uProfileDim": model.u_profile_dim,
        "uBehaviorSize": model.behavior_len,
        "uBehaviorDim": model.behavior_dim,
        "iFeatureDim": model.i_feature_dim,
        "cFeatureDim": model.c_feature_dim,
        "mlp0": np.asarray(params["mlp"][0]).ravel().tolist(),
        "mlp1": np.asarray(params["mlp"][1]).ravel().tolist(),
        "mlp2": np.asarray(params["mlp"][2]).ravel().tolist(),
        "att0": np.asarray(params["att0"]).ravel().tolist(),
    }
    return json.dumps(d)


def din_from_json(data: str) -> tuple[DIN, dict]:
    m = json.loads(data)
    model = DIN(
        u_profile_dim=m["uProfileDim"], behavior_len=m["uBehaviorSize"],
        behavior_dim=m["uBehaviorDim"], i_feature_dim=m["iFeatureDim"],
        c_feature_dim=m["cFeatureDim"], use_bias=False)
    cd = model.concat_dim
    params = {
        "att0": jnp.asarray(m["att0"], jnp.float32).reshape(m["uBehaviorSize"]),
        "mlp": [
            jnp.asarray(m["mlp0"], jnp.float32).reshape(cd, model.hidden[0]),
            jnp.asarray(m["mlp1"], jnp.float32).reshape(model.hidden[0],
                                                        model.hidden[1]),
            jnp.asarray(m["mlp2"], jnp.float32).reshape(model.hidden[1], 1),
        ],
    }
    return model, params


def youtube_dnn_to_json(model: YoutubeDNN, params: dict) -> str:
    d = {
        "uProfileDim": model.u_profile_dim,
        "uBehaviorSize": model.behavior_len,
        "uBehaviorDim": model.behavior_dim,
        "iFeatureDim": model.i_feature_dim,
        "cFeatureDim": model.c_feature_dim,
        "mlp0": np.asarray(params["mlp"][0]).ravel().tolist(),
        "mlp1": np.asarray(params["mlp"][1]).ravel().tolist(),
        "mlp2": np.asarray(params["mlp"][2]).ravel().tolist(),
    }
    return json.dumps(d)


def youtube_dnn_from_json(data: str) -> tuple[YoutubeDNN, dict]:
    m = json.loads(data)
    model = YoutubeDNN(
        u_profile_dim=m["uProfileDim"], behavior_len=m["uBehaviorSize"],
        behavior_dim=m["uBehaviorDim"], i_feature_dim=m["iFeatureDim"],
        c_feature_dim=m["cFeatureDim"], use_bias=False)
    cd = model.concat_dim
    params = {
        "mlp": [
            jnp.asarray(m["mlp0"], jnp.float32).reshape(cd, model.hidden[0]),
            jnp.asarray(m["mlp1"], jnp.float32).reshape(model.hidden[0],
                                                        model.hidden[1]),
            jnp.asarray(m["mlp2"], jnp.float32).reshape(model.hidden[1], 1),
        ],
    }
    return model, params


# -------------------------------------------------------- full checkpoints ---

def _model_types() -> dict:
    from goctr_tpu.models.mlp_tower import MLPTower
    return {"DIN": DIN, "YoutubeDNN": YoutubeDNN, "MLPTower": MLPTower}


def save_checkpoint(path: str | Path, ranker: TrainedRanker,
                    trainer_config=None) -> None:
    """Full npz+json checkpoint: model config, SampleInfo, params, loss
    curve, and — when present — optimizer state + trainer config, enabling
    true mid-training resume (reference snapshots are weights-only,
    din.go:62-147)."""
    import jax

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    model = ranker.model
    meta = {
        "model_type": type(model).__name__,
        "model_config": _model_config_dict(model),
        "sample_info": dataclasses.asdict(ranker.info),
        "behavior_len": ranker.behavior_len,
        "loss_curve": ranker.loss_curve,
        "trainer_config": (dataclasses.asdict(trainer_config)
                           if trainer_config is not None else None),
    }
    (path / "meta.json").write_text(json.dumps(meta))
    flat = _flatten_params(ranker.params)
    np.savez(path / "params.npz", **flat)
    if ranker.opt_state is not None:
        leaves = jax.tree.leaves(ranker.opt_state)
        np.savez(path / "opt_state.npz",
                 **{str(i): np.asarray(l) for i, l in enumerate(leaves)})


def load_checkpoint(path: str | Path) -> TrainedRanker:
    path = Path(path)
    meta = json.loads((path / "meta.json").read_text())
    cls = _model_types()[meta["model_type"]]
    cfg = dict(meta["model_config"])
    for k in ("hidden", "dropout_rates"):
        if k in cfg and isinstance(cfg[k], list):
            cfg[k] = tuple(cfg[k])
    model = cls(**cfg)
    with np.load(path / "params.npz") as z:
        params = _unflatten_params(dict(z.items()))
    si = meta["sample_info"]
    info = SampleInfo(**{k: tuple(v) for k, v in si.items()})

    opt_state = None
    opt_path = path / "opt_state.npz"
    tc = meta.get("trainer_config")
    if opt_path.exists() and tc is not None:
        import jax

        from goctr_tpu.models.trainer import TrainerConfig
        from goctr_tpu.optim.optimizers import make_solver
        from goctr_tpu.optim.schedules import make_schedule
        cfg = TrainerConfig(**tc)
        solver = make_solver(
            cfg.solver, make_schedule(cfg.lr_schedule, cfg.lr, cfg.power_t),
            l2=cfg.l2, weight_decay=cfg.weight_decay, momentum=cfg.momentum,
            beta1=cfg.beta1, beta2=cfg.beta2, epsilon=cfg.epsilon)
        template = solver.init(params)
        treedef = jax.tree.structure(template)
        with np.load(opt_path) as z:
            leaves = [jnp.asarray(z[str(i)]) for i in range(len(z.files))]
        opt_state = jax.tree.unflatten(treedef, leaves)

    return TrainedRanker(
        model=model, params=params, info=info,
        behavior_len=meta["behavior_len"], loss_curve=meta["loss_curve"],
        opt_state=opt_state,
        _predict_fn=_make_predict_fn(model, info, meta["behavior_len"]))


# --------------------------------------------- sharded-sparse checkpoints ---

def save_sparse_checkpoint(path: str | Path, model, dense_params: dict,
                           table_w: np.ndarray, table_acc: np.ndarray,
                           loss_curve: list, opt_state=None,
                           trainer_config=None, table_opt=None) -> None:
    """Checkpoint a (possibly mid-training) sharded SparseCTR run
    (VERDICT r4 next-#4): plain host-layout [vocab, D] table + [vocab]
    row-wise adagrad accumulator — callers export from whatever packed /
    grouped device layout they hold (TrainedSparseRanker.save) — plus
    dense params, dense-optimizer state, loss curve, and the trainer +
    table-optimizer configs needed to resume. Topology-independent: load
    into any (data, model) mesh."""
    import jax

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    meta = {
        "model_config": {
            "item_vocab": model.item_vocab, "emb_dim": model.emb_dim,
            "u_profile_dim": model.u_profile_dim, "ctx_dim": model.ctx_dim,
            "behavior_len": model.behavior_len,
            "hidden": list(model.hidden), "activation": model.activation,
            "dropout_rate": model.dropout_rate,
            "lookup_dedup_cap": model.lookup_dedup_cap,
            "pooling": model.pooling,
        },
        "loss_curve": [float(x) for x in loss_curve],
        "trainer_config": (dataclasses.asdict(trainer_config)
                           if trainer_config is not None else None),
        "table_opt": (dataclasses.asdict(table_opt)
                      if table_opt is not None else None),
    }
    (path / "meta.json").write_text(json.dumps(meta))
    np.savez(path / "dense.npz", **_flatten_params(dense_params))
    np.savez(path / "table.npz", table=np.asarray(table_w),
             acc=np.asarray(table_acc))
    if opt_state is not None:
        leaves = jax.tree.leaves(opt_state)
        np.savez(path / "opt_state.npz",
                 **{str(i): np.asarray(x) for i, x in enumerate(leaves)})


def load_sparse_checkpoint(path: str | Path, mesh):
    """Load a sparse checkpoint onto `mesh` as a TrainedSparseRanker in
    PLAIN layout ([V_pad, D] table row-sharded over `model`, [V_pad] acc);
    pass it to train_sparse(resume_from=...) — the trainer re-packs into
    its packed/grouped device layout (with the restored accumulator) and
    replays the shuffle/PRNG streams for bit-exact continuation. Returns
    (ranker, trainer_config | None, table_opt | None)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from goctr_tpu.parallel.sparse_ctr import SparseCTR
    from goctr_tpu.parallel.sparse_trainer import TrainedSparseRanker

    path = Path(path)
    meta = json.loads((path / "meta.json").read_text())
    mc = dict(meta["model_config"])
    mc["hidden"] = tuple(mc["hidden"])
    model = SparseCTR(**mc)
    with np.load(path / "dense.npz") as z:
        dense = _unflatten_params(dict(z.items()))
    with np.load(path / "table.npz") as z:
        w = z["table"].astype(np.float32)
        a = z["acc"].astype(np.float32)
    m_sh = mesh.shape["model"]
    v_pad = -(-w.shape[0] // m_sh) * m_sh
    if v_pad > w.shape[0]:
        w = np.concatenate(
            [w, np.zeros((v_pad - w.shape[0], w.shape[1]), np.float32)])
        a = np.concatenate([a, np.zeros(v_pad - a.shape[0], np.float32)])
    params = {k: jax.device_put(v, NamedSharding(mesh, P()))
              for k, v in jax.tree.map(jnp.asarray, dense).items()}
    params["item_table"] = jax.device_put(
        jnp.asarray(w), NamedSharding(mesh, P("model", None)))
    acc = jax.device_put(jnp.asarray(a), NamedSharding(mesh, P("model")))

    trainer_config = table_opt = None
    tc = meta.get("trainer_config")
    if tc is not None:
        from goctr_tpu.models.trainer import TrainerConfig
        trainer_config = TrainerConfig(**tc)
    to = meta.get("table_opt")
    if to is not None:
        from goctr_tpu.parallel.table_opt import TableOptConfig
        table_opt = TableOptConfig(**to)

    opt_state = None
    opt_path = path / "opt_state.npz"
    if opt_path.exists() and trainer_config is not None:
        from goctr_tpu.optim.optimizers import make_solver
        from goctr_tpu.optim.schedules import make_schedule
        cfg = trainer_config
        solver = make_solver(
            cfg.solver, make_schedule(cfg.lr_schedule, cfg.lr, cfg.power_t),
            l2=cfg.l2, weight_decay=cfg.weight_decay, momentum=cfg.momentum,
            beta1=cfg.beta1, beta2=cfg.beta2, epsilon=cfg.epsilon)
        template = solver.init(
            {k: v for k, v in params.items() if k != "item_table"})
        treedef = jax.tree.structure(template)
        with np.load(opt_path) as z:
            leaves = [jnp.asarray(z[str(i)]) for i in range(len(z.files))]
        opt_state = jax.tree.unflatten(treedef, leaves)

    ranker = TrainedSparseRanker(
        model=model, params=params, mesh=mesh,
        loss_curve=meta["loss_curve"], epoch_times=[],
        opt_state=opt_state, acc=acc)
    return ranker, trainer_config, table_opt


def _model_config_dict(model) -> dict:
    d = dataclasses.asdict(model)
    d.pop("compute_dtype", None)
    return d


def _flatten_params(params: dict, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for k, v in params.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten_params(v, key + "."))
        elif isinstance(v, (list, tuple)):
            for i, x in enumerate(v):
                out[f"{key}.{i}"] = np.asarray(x)
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten_params(flat: dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return _listify(tree)


def _listify(node):
    if isinstance(node, dict):
        if node and all(k.isdigit() for k in node):
            return [_listify(node[str(i)]) for i in range(len(node))]
        return {k: _listify(v) for k, v in node.items()}
    return node
