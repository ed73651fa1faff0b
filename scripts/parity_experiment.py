"""Metric-parity experiment: this framework vs a plain-torch
reference-equivalent, trained on the IDENTICAL synthetic-DLC corpus.

The environment has no network access, so the real DLC/cadence corpora
cannot be fetched (RESULTS.md documents this blocker).  This protocol is
the strongest available substitute for BASELINE target #2: generate a
musically-structured corpus in the exact DLC TSV schema
(data/synth_dlc.py), ingest it through the production ``--raw_dir`` path,
train BOTH frameworks with the reference recipe (HybridGNN-equivalent
3x256, wloss, subgraph 500, warmup-cosine 5e-3, clip 1.0), and compare
cadence macro-F1 + onset-wise RNA accuracy on the same held-out pieces,
computed by the same metric code (train/metrics.py).

    python scripts/parity_experiment.py gen     # corpus -> data_synth/
    python scripts/parity_experiment.py jax     # train+eval on the chip
    python scripts/parity_experiment.py torch   # torch anchor (CPU)

Each stage writes results_<stage>.json; RESULTS.md summarizes.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Round-4 large-corpus study (VERDICT r3 asks #1/#6): every knob below can
# be overridden from the environment so the SAME harness drives the 24-piece
# round-3 protocol and the 5x corpus / 5x step-budget crossover runs.
DATA_DIR = os.environ.get("PARITY_DATA_DIR", os.path.join(ROOT, "data_synth"))
SPLIT_FILE = os.path.join(DATA_DIR, "test_split.json")
OOD_DATA_DIR = os.environ.get(
    "PARITY_OOD_DATA_DIR", os.path.join(ROOT, "data_synth_ood")
)
OOD_SPLIT_FILE = os.path.join(OOD_DATA_DIR, "test_split.json")
N_PIECES = int(os.environ.get("PARITY_PIECES", "24"))
N_PHRASES = 10
# the reference's own default epoch budget
# (/root/reference/analysisgnn/train/train_analysisgnn.py:56)
EPOCHS = int(os.environ.get("PARITY_EPOCHS", "50"))
# periodic test-split eval cadence (epochs) for the crossover curve; 0 = off
EVAL_EVERY = int(os.environ.get("PARITY_EVAL_EVERY", "0"))
SEED = int(os.environ.get("PARITY_SEED", "0"))
# artifact-name suffix for side-study arms (e.g. "_l" for the 5x corpus)
TAG = os.environ.get("PARITY_TAG", "")


def stage_gen() -> None:
    from analysisgnn_tpu.data.synth_dlc import write_corpus

    split = write_corpus(
        os.path.join(DATA_DIR, "all"), n_pieces=N_PIECES, n_phrases=N_PHRASES,
        seed=7, test_fraction=0.2,
    )
    with open(SPLIT_FILE, "w") as f:
        json.dump(split["test"], f)
    print(json.dumps({"pieces": N_PIECES, "test": split["test"]}))


def stage_gen_ood() -> None:
    """Evaluation-only corpus from UNSEEN generator parameters (VERDICT r2
    ask #7: de-self-grade): different progression grammar, 4x denser NCTs,
    disjoint key emphasis, deceptive cadences, irregular rhythm — style
    'ood' in data/synth_dlc.py.  Both frameworks train on data_synth/ and
    are evaluated on this corpus; neither ever sees it during training or
    during any recipe sweep."""
    from analysisgnn_tpu.data.synth_dlc import write_corpus

    split = write_corpus(
        os.path.join(OOD_DATA_DIR, "all"), n_pieces=12, n_phrases=N_PHRASES,
        seed=23, test_fraction=10 / 12, style="ood",
    )
    with open(OOD_SPLIT_FILE, "w") as f:
        json.dump(split["test"], f)
    print(json.dumps({"pieces": 12, "test": split["test"]}))


def _cli_args(checkpoint_dir: str):
    return [
        "--raw_dir", DATA_DIR,
        "--test_split_file", SPLIT_FILE,
        "--do_train", "--do_eval",
        "--model", "HybridGNN",
        "--num_layers", "3", "--hidden_channels", "256",
        "--out_channels", "128",
        "--num_epochs", str(EPOCHS),
        "--subgraph_size", "500", "--batch_size", "80",
        "--main_tasks", "all",
        "--use_transpositions",
        "--checkpoint_dir", checkpoint_dir,
        "--seed", str(SEED),
    ] + (
        ["--test_eval_every", str(EVAL_EVERY)] if EVAL_EVERY else []
    )


def _run_cli_capture_metrics(args: list):
    """Run the train CLI; return the final top-level JSON object printed
    to stdout (the --do_eval metric dict)."""
    import contextlib
    import io

    from analysisgnn_tpu.cli.train import main

    buf = io.StringIO()

    class Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            sys.__stdout__.write(s)
            return len(s)

    with contextlib.redirect_stdout(Tee()):
        main(args)
    text = buf.getvalue()
    metrics = None
    depth, end = 0, len(text)
    for i in range(len(text) - 1, -1, -1):
        if text[i] == "}":
            if depth == 0:
                end = i + 1
            depth += 1
        elif text[i] == "{":
            depth -= 1
            if depth == 0:
                metrics = json.loads(text[i:end])
                break
    return metrics


def _apply_platform_override():
    # Task metrics are platform-independent; PARITY_PLATFORM=cpu lets the
    # queued recipe arms run while the tunnel chip is down (the config
    # update must happen before any device use — see docs/STATUS.md).
    platform = os.environ.get("PARITY_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    return platform


def stage_jax(extra: list = (), out_name: str = "results_jax.json",
              ckpt_name: str = "checkpoints_parity") -> None:
    """Train+eval on the chip.  ``extra`` appends/overrides CLI flags so
    recipe arms can be launched as e.g.::

        python scripts/parity_experiment.py jax results_jax_fnorm.json \
            ckpt_fnorm --final_norm --dropout 0.0
    """
    platform = _apply_platform_override()
    ckpt = os.path.join(ROOT, ckpt_name)
    metrics = _run_cli_capture_metrics(_cli_args(ckpt) + list(extra))
    out = {
        "framework": "analysisgnn_tpu",
        "epochs": EPOCHS,
        "extra_flags": list(extra),
        "platform": platform or "default",
        "metrics": metrics,
    }
    with open(os.path.join(ROOT, out_name), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


def stage_jax_eval_ood(extra: list = (), out_name: str = "results_jax_ood.json",
                       ckpt_name: str = "checkpoints_parity") -> None:
    """Evaluate an already-trained checkpoint on the UNSEEN ood-style corpus
    (stage_gen_ood).  ``extra`` must repeat the architecture flags the
    checkpoint was trained with (not the training-only flags)."""
    platform = _apply_platform_override()
    ckpt = os.path.join(ROOT, ckpt_name)
    args = [
        "--raw_dir", OOD_DATA_DIR,
        "--test_split_file", OOD_SPLIT_FILE,
        "--do_eval",
        "--model", "HybridGNN",
        "--num_layers", "3", "--hidden_channels", "256",
        "--out_channels", "128",
        "--subgraph_size", "500", "--batch_size", "80",
        "--main_tasks", "all",
        "--checkpoint_dir", ckpt,
    ] + list(extra)
    metrics = _run_cli_capture_metrics(args)
    out = {
        "framework": "analysisgnn_tpu",
        "eval_corpus": "ood",
        "checkpoint": ckpt_name,
        "extra_flags": list(extra),
        "platform": platform or "default",
        "metrics": metrics,
    }
    with open(os.path.join(ROOT, out_name), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


# ---------------------------------------------------------------------------
# torch reference-equivalent
# ---------------------------------------------------------------------------


def _build_datamodule(data_dir: str = DATA_DIR, split_file: str = SPLIT_FILE):
    from analysisgnn_tpu.data.corpus import CorpusConfig, DLCTsvCorpus
    from analysisgnn_tpu.data.datamodule import AnalysisDataModule, DataModuleConfig

    with open(split_file) as f:
        test_names = json.load(f)
    ccfg = CorpusConfig(
        cache_dir=os.path.join(data_dir, ".cache"), feature_type="voice",
        transpose=True,
    )
    corpus = DLCTsvCorpus(
        ccfg, os.path.join(data_dir, "all"), test_names=test_names, dlc=True
    ).load()
    dm_cfg = DataModuleConfig(
        subgraph_size=500, batch_size=8, augment=True, seed=SEED
    )
    return AnalysisDataModule({"all": corpus.samples}, dm_cfg).setup()


_RELATIONS = [
    "onset", "consecutive", "during", "rest",
    "consecutive_rev", "during_rev", "rest_rev",
]


def _unpack(batch, tasks):
    """Padded HeteroGraph -> ragged torch tensors (valid rows only)."""
    import torch

    from analysisgnn_tpu.core.graph import NOTE

    nvalid = int(np.asarray(batch.num_nodes[NOTE]))
    edges = {}
    for r in _RELATIONS:
        key = f"note__{r}__note"
        e = np.asarray(batch.edge_index[key])[:, : int(np.asarray(batch.num_edges[key]))]
        edges[r] = torch.from_numpy(e.astype(np.int64)).clamp(max=nvalid - 1)
    attrs = batch.node_attrs[NOTE]
    x = torch.from_numpy(np.asarray(batch.node_features[NOTE])[:nvalid])
    ps = torch.from_numpy(np.asarray(attrs["pitch_spelling"])[:nvalid].astype(np.int64))
    ks = torch.from_numpy(np.asarray(attrs["key_signature"])[:nvalid].astype(np.int64))
    labels = {
        t: torch.from_numpy(
            np.minimum(np.asarray(attrs[t])[:nvalid], c - 1).astype(np.int64)
        )
        for t, c in tasks
        if t in attrs
    }
    n_target = int(np.asarray(batch.num_target_nodes))
    base = np.zeros(nvalid, bool)
    base[:n_target] = True
    if "valid_label" in attrs:
        base &= np.asarray(attrs["valid_label"])[:nvalid].astype(bool)
    return x, ps, ks, edges, labels, base, nvalid


def stage_torch(dropout: float = 0.3) -> None:
    """Torch anchor at the VERBATIM reference recipe.

    Round 2's anchor omitted dropout entirely (anchor-favorable at this
    small-corpus budget: the reference applies it between every encoder
    layer, core/hgnn.py:170-174, at default 0.3).  The anchor now carries
    the same per-layer dropout, so "reference recipe" means the same thing
    on both sides of the table.  ``dropout=0`` reproduces the round-2
    anchor."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch

    from bench_torch_reference import RefModel
    from analysisgnn_tpu.core.graph import NOTE
    from analysisgnn_tpu.theory.vocab import TASK_DICT
    from analysisgnn_tpu.train.schedules import warmup_cosine_schedule
    from analysisgnn_tpu.train.step import TASK_MASK_ATTRS

    torch.manual_seed(SEED)
    tasks = tuple((t, c) for t, c in TASK_DICT.items())
    dm = _build_datamodule()
    steps_per_epoch = dm.steps_per_epoch("all")
    total_steps = steps_per_epoch * EPOCHS
    print(f"steps/epoch={steps_per_epoch} total={total_steps}")

    model = RefModel(dm.feature_dim, 256, 128, _RELATIONS, tasks,
                     dropout=dropout)
    wloss_p = torch.nn.Parameter(torch.ones(len(tasks)))
    optim = torch.optim.AdamW(
        list(model.parameters()) + [wloss_p], lr=5e-3, weight_decay=5e-3
    )
    sched = warmup_cosine_schedule(5e-3, total_steps=total_steps)

    def masked_ce(logits, labels, mask):
        lw = torch.from_numpy(mask.astype(np.float32))
        ls = torch.nn.functional.cross_entropy(
            logits, labels, label_smoothing=0.1, reduction="none"
        )
        return (ls * lw).sum() / lw.sum().clamp(min=1.0)

    step_i = 0
    curve = []
    for epoch in range(EPOCHS):
        ep_loss, nb = 0.0, 0
        for batch in dm.train_batches("all", steps_per_epoch):
            x, ps, ks, edges, labels, base, _ = _unpack(batch, tasks)
            for g in optim.param_groups:
                g["lr"] = float(sched(step_i))
            optim.zero_grad()
            logits = model(x, ps, ks, edges)
            total = 0.0
            for ti, (t, _c) in enumerate(tasks):
                if t not in labels:
                    continue
                mask = base.copy()
                mattr = TASK_MASK_ATTRS.get(t)
                if mattr and mattr in batch.node_attrs[NOTE]:
                    m = np.asarray(batch.node_attrs[NOTE][mattr])[: len(mask)]
                    mask &= m.astype(bool)
                l_t = masked_ce(logits[t], labels[t], mask)
                p = wloss_p[ti]
                total = total + 0.5 / p.pow(2) * l_t + torch.log1p(p.pow(2))
            total.backward()
            # Lightning's gradient_clip_val=1.0 clips the OPTIMIZER's params
            # jointly — the reference registers MultiTaskLoss.params on the
            # module, so its wloss weights are inside the clip norm
            # (models/chord.py:35, configure_optimizers analysis.py:1381).
            # Clipping model-only (the round-2 anchor) hands the model a
            # full-strength update every step regardless of how large the
            # wloss grads are — a material deviation at high-loss phases.
            torch.nn.utils.clip_grad_norm_(
                list(model.parameters()) + [wloss_p], 1.0
            )
            optim.step()
            ep_loss += float(total)
            nb += 1
            step_i += 1
        print(f"epoch {epoch}: loss {ep_loss / max(nb, 1):.4f}", flush=True)
        if EVAL_EVERY and (
            (epoch + 1) % EVAL_EVERY == 0 or epoch + 1 == EPOCHS
        ):
            # mirror of the jax side's test_curve.jsonl (train/loop.py):
            # same test split, same metric code, recorded at the same
            # global-epoch boundaries — the two curves are the crossover plot
            m = _torch_eval(model, dm, tasks)
            model.train()
            curve.append({
                "global_epoch": epoch + 1,
                "steps": step_i,
                # learned wloss uncertainty p per task — mirror of the jax
                # curve's field (per-head effective-lr probe, VERDICT r4 #1a)
                "wloss_p": [round(float(v), 5) for v in wloss_p.detach()],
                **{k: float(v) for k, v in m.items()},
            })
            with open(os.path.join(ROOT, f"results_torch_curve{TAG}.jsonl"), "a") as cf:
                cf.write(json.dumps(curve[-1]) + "\n")

    # persist the trained anchor so held-out corpora can be scored later
    # without retraining (stage torch-eval-ood)
    torch.save(
        {"model": model.state_dict(), "wloss": wloss_p.detach(),
         "feature_dim": dm.feature_dim},
        os.path.join(ROOT, f"checkpoints_parity_torch{TAG}.pt"),
    )
    metrics = _torch_eval(model, dm, tasks)
    out = {
        "framework": "torch-cpu reference-equivalent",
        "epochs": EPOCHS,
        "dropout": dropout,
        "metrics": metrics,
    }
    with open(os.path.join(ROOT, f"results_torch{TAG}.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


def _torch_eval(model, dm, tasks) -> dict:
    """Evaluation with the SAME metric code as the JAX framework."""
    import torch
    import jax.numpy as jnp

    from analysisgnn_tpu.core.graph import NOTE
    from analysisgnn_tpu.train.step import TASK_MASK_ATTRS
    from analysisgnn_tpu.train.metrics import (
        NCT_RNA_KEYS,
        RNA_KEYS,
        accumulate_weighted,
        f1_stats,
        finalize_weighted,
        masked_accuracy,
        nct_rna_accuracy,
        onsetwise_rna_accuracy,
    )

    acc: dict = {}
    model.eval()
    with torch.no_grad():
        for batch in dm.test_batches("all"):
            x, ps, ks, edges, labels, base, nvalid = _unpack(batch, tasks)
            logits = model(x, ps, ks, edges)
            jl = {t: jnp.asarray(v.numpy()) for t, v in logits.items()}
            jlabels = {t: jnp.asarray(v.numpy()) for t, v in labels.items()}
            out = {}
            base_j = jnp.asarray(base)
            attrs = batch.node_attrs[NOTE]
            task_w = {}
            for t, c in tasks:
                if t not in jlabels:
                    continue
                w = base.copy()
                mattr = TASK_MASK_ATTRS.get(t)
                if mattr and mattr in attrs:
                    w &= np.asarray(attrs[mattr])[:nvalid].astype(bool)
                task_w[t] = jnp.asarray(w)
                out[f"{t}_acc"] = masked_accuracy(jl[t], jlabels[t], task_w[t])
                out[f"{t}_acc__w"] = task_w[t].sum().astype(jnp.float32)
                out[f"{t}_f1_stats"] = f1_stats(jl[t], jlabels[t], task_w[t], c)
            if all(k in jl for k in RNA_KEYS):
                onset_key = "note__onset__note"
                ne = int(np.asarray(batch.num_edges[onset_key]))
                onset = jnp.asarray(
                    np.asarray(batch.edge_index[onset_key])[:, :ne].astype(np.int32)
                )
                a, w = onsetwise_rna_accuracy(
                    jl, jlabels, onset,
                    jnp.asarray(np.asarray(attrs["onset_div"])[:nvalid]),
                    jnp.asarray(np.asarray(batch.batch[NOTE])[:nvalid]),
                    base_j, with_weight=True,
                )
                out["rna_onset_acc"] = a
                out["rna_onset_acc__w"] = w
            if all(k in jl for k in NCT_RNA_KEYS) and "tpc_in_label" in jl:
                a, w = nct_rna_accuracy(jl, jlabels, base_j, with_weight=True)
                out["rna_nct_acc"] = a
                out["rna_nct_acc__w"] = w
            accumulate_weighted(acc, out)
    return {f"all/{k}": v for k, v in finalize_weighted(acc).items()}


def stage_torch_eval_ood() -> None:
    """Score the saved torch anchor on the unseen ood-style corpus."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch

    from bench_torch_reference import RefModel
    from analysisgnn_tpu.theory.vocab import TASK_DICT

    tasks = tuple((t, c) for t, c in TASK_DICT.items())
    ckpt = torch.load(
        os.path.join(ROOT, f"checkpoints_parity_torch{TAG}.pt"), weights_only=False
    )
    dm = _build_datamodule(OOD_DATA_DIR, OOD_SPLIT_FILE)
    model = RefModel(ckpt["feature_dim"], 256, 128, _RELATIONS, tasks)
    model.load_state_dict(ckpt["model"])
    model.eval()
    metrics = _torch_eval(model, dm, tasks)
    out = {
        "framework": "torch-cpu reference-equivalent",
        "eval_corpus": "ood",
        "metrics": metrics,
    }
    with open(os.path.join(ROOT, f"results_torch_ood{TAG}.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    if sys.argv[1] == "jax" and len(sys.argv) > 2:
        stage_jax(sys.argv[4:], out_name=sys.argv[2], ckpt_name=sys.argv[3])
    elif sys.argv[1] == "jax-eval-ood" and len(sys.argv) > 2:
        stage_jax_eval_ood(sys.argv[4:], out_name=sys.argv[2],
                           ckpt_name=sys.argv[3])
    elif sys.argv[1] == "torch":
        stage_torch(float(sys.argv[2]) if len(sys.argv) > 2 else 0.3)
    else:
        {
            "gen": stage_gen,
            "gen-ood": stage_gen_ood,
            "jax": stage_jax,
            "jax-eval-ood": stage_jax_eval_ood,
            "torch-eval-ood": stage_torch_eval_ood,
        }[sys.argv[1]]()
