"""``analysisgnn-tpu-predict`` — score-analysis inference CLI.

Parity with the reference ``analysisgnn-predict`` (analysisgnn/inference/
predict_analysis.py): resolve a checkpoint (local dir → artifact cache →
W&B artifact download, :79-125), parse a MusicXML score, run the model,
decode labels, export CSV and optionally a Roman-numeral MusicXML.
"""

from __future__ import annotations

import argparse
import json
import os


def resolve_checkpoint(checkpoint_dir: str, tag: str,
                       artifacts_dir: str = "./artifacts/models") -> str:
    """Resolve a checkpoint directory the way the reference resolves its
    ``.ckpt`` (inference/predict_analysis.py:79-125): prefer the local
    path, then any previously-downloaded copy under ``artifacts_dir``,
    then — if ``checkpoint_dir`` looks like a W&B artifact reference
    (``entity/project/name:version``) — download it via the wandb API.

    Checkpoints here are Orbax directories (containing ``_METADATA``) plus
    a sibling ``model_config.json``, so the cache scan looks for directory
    entries rather than ``.ckpt`` files.
    """
    local = os.path.join(checkpoint_dir, tag)
    if os.path.isdir(local):
        return checkpoint_dir

    def _is_ckpt_root(d: str) -> bool:
        return os.path.isfile(os.path.join(d, "model_config.json")) and (
            os.path.isdir(os.path.join(d, tag))
        )

    # cached artifact scan (reference :86-105)
    if os.path.isdir(artifacts_dir):
        if _is_ckpt_root(artifacts_dir):
            print(f"Using cached checkpoint: {artifacts_dir}")
            return artifacts_dir
        for fname in sorted(os.listdir(artifacts_dir)):
            cand = os.path.join(artifacts_dir, fname)
            if os.path.isdir(cand) and _is_ckpt_root(cand):
                print(f"Using cached checkpoint: {cand}")
                return cand

    # W&B artifact reference, e.g. "melkisedeath/AnalysisGNN/model-xyz:v3"
    # (reference :107-125); requires network + wandb login.  Filesystem
    # paths never qualify: artifact ids are relative and carry a :version.
    looks_like_artifact = (
        not os.path.isabs(checkpoint_dir)
        and ":" in os.path.basename(checkpoint_dir)
        and checkpoint_dir.count("/") >= 2
    )
    if looks_like_artifact:
        try:
            import wandb  # noqa: F401  (not baked in: optional)
        except ImportError as e:
            raise ImportError(
                "wandb package is required to download artifacts; "
                f"no local checkpoint at {local} and no cached copy in "
                f"{artifacts_dir}"
            ) from e
        os.makedirs(artifacts_dir, exist_ok=True)
        print(f"Downloading checkpoint from W&B: {checkpoint_dir}")
        run = wandb.init()
        artifact = run.use_artifact(checkpoint_dir, type="model")
        art_dir = artifact.download(root=artifacts_dir)
        wandb.finish()
        if _is_ckpt_root(art_dir):
            return art_dir
        for fname in sorted(os.listdir(art_dir)):
            cand = os.path.join(art_dir, fname)
            if os.path.isdir(cand) and _is_ckpt_root(cand):
                return cand
        raise FileNotFoundError(
            f"W&B artifact {checkpoint_dir} contains no Orbax checkpoint "
            f"with tag {tag!r}"
        )
    raise FileNotFoundError(
        f"no checkpoint {tag!r} under {checkpoint_dir} and no cached copy "
        f"in {artifacts_dir}"
    )


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Predict analysis for a score")
    p.add_argument("--score", type=str, default=None,
                   help="MusicXML/.mxl/.krn path")
    p.add_argument("--score_dir", type=str, default=None,
                   help="batch mode: predict every score file in this "
                        "directory (recursive)")
    p.add_argument("--output_dir", type=str, default=None,
                   help="batch mode: write per-score CSVs here "
                        "(default: alongside each score)")
    p.add_argument("--bucket_factor", type=float, default=1.25,
                   help="batch mode: pad graphs to a geometric capacity "
                        "ladder with this growth factor so scores share "
                        "compiled programs (0 disables bucketing)")
    p.add_argument("--partition_devices", type=int, default=0,
                   help="shard the full-graph encode across this many "
                        "devices (overlap-region graph partition; for "
                        "scores too large for one chip's HBM; note-node "
                        "model configs only)")
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints",
                   help="local checkpoint dir OR W&B artifact id "
                        "(entity/project/name:version)")
    p.add_argument("--checkpoint", type=str, default="best",
                   help="checkpoint tag inside checkpoint_dir (best/last/<task>_model)")
    p.add_argument("--artifacts_dir", type=str, default="./artifacts/models",
                   help="cache dir for downloaded checkpoints")
    p.add_argument("--conv_impl", type=str, default=None,
                   choices=["node", "edge", "edge-zxp"],
                   help="override the fused-SAGE implementation for this "
                        "inference run (parameter-compatible; 'edge' moves "
                        "fewer HBM bytes at full-graph scale — "
                        "docs/STATUS.md roofline)")
    p.add_argument("--hgt_stage_dtype", type=str, default=None,
                   choices=["float32", "bfloat16"],
                   help="override the HGT q/k/v staging dtype for this "
                        "inference run; default = whatever the checkpoint "
                        "was trained with (model_config.json), falling back "
                        "to float32 (ADVICE r4: the saved key was "
                        "previously ignored on the predict path)")
    p.add_argument("--tasks", type=str, default=None, help="comma list; default all")
    p.add_argument("--output_csv", type=str, default=None)
    p.add_argument("--output_musicxml", type=str, default=None,
                   help="write Roman-numeral annotation MusicXML here")
    p.add_argument("--export_musicxml", action="store_true",
                   help="batch mode: also write <score>_rna.musicxml per "
                        "score next to the CSVs")
    return p


def load_model_and_params(checkpoint_dir: str, tag: str,
                          conv_impl: str | None = None,
                          hgt_stage_dtype: str | None = None):
    import jax
    import orbax.checkpoint as ocp

    from analysisgnn_tpu.core.graph import metadata
    from analysisgnn_tpu.models.analysis import AnalysisGNN
    from analysisgnn_tpu.theory.vocab import TASK_DICT

    with open(os.path.join(checkpoint_dir, "model_config.json")) as f:
        cfg = json.load(f)
    nodes, edges = metadata(cfg.get("add_beats", False), cfg.get("add_measures", False))
    model = AnalysisGNN(
        metadata=(nodes, edges),
        in_channels=cfg["in_channels"],
        hidden_channels=cfg["hidden_channels"],
        out_channels=cfg["out_channels"],
        task_dict=tuple(TASK_DICT.items()),
        num_layers=cfg["num_layers"],
        dropout=cfg.get("dropout", 0.3),
        use_jk=cfg.get("use_jk", True),
        # absent keys mean a pre-round-3 checkpoint: deep stacks, raw final
        # conv (the old defaults) — new train runs write both keys
        final_norm=cfg.get("final_norm", False),
        plain_proj=cfg.get("plain_proj", False),
        logit_fusion=cfg.get("logit_fusion", False),
        use_rnn=cfg.get("use_rnn", False),
        hgt_group_mode=cfg.get("hgt_group_mode", "pair"),
        encoder_type=cfg.get("model", "HybridGNN").lower(),
        # computation-order knob only — the param tree is identical across
        # impls (tests/test_fused.py), so any checkpoint can run either
        conv_impl=conv_impl or cfg.get("conv_impl", "node"),
        # numerics knob (bf16 staging, f32 softmax/accum): honor the value
        # the checkpoint was trained with unless overridden.  An explicit
        # override is passed through verbatim so an incompatible encoder
        # raises instead of silently measuring f32 (ADVICE r4); the saved
        # config value is only honored for HGT checkpoints.
        hgt_stage_dtype=(
            hgt_stage_dtype if hgt_stage_dtype is not None
            else (cfg.get("hgt_stage_dtype", "float32")
                  if cfg.get("model", "HybridGNN").lower() == "hgt"
                  else "float32")
        ),
        # value-identical softmax variant — honor the trained config
        hgt_softmax_stab=cfg.get("hgt_softmax_stab", "global"),
    )
    # build an abstract params tree to restore into
    import numpy as np

    from analysisgnn_tpu.data.note_array import synthetic_score
    from analysisgnn_tpu.inference.predict import graph_from_note_array
    from analysisgnn_tpu.core.graph import NOTE

    na = synthetic_score(16, seed=0)
    g = graph_from_note_array(
        na,
        feature_type=cfg.get("feature_type", "simple").replace("simple", "voice"),
        add_beats=cfg.get("add_beats", False),
        add_measures=cfg.get("add_measures", False),
    )
    attrs = g.node_attrs[NOTE]
    params0 = model.init(
        jax.random.PRNGKey(0),
        g.x_dict(), g.edge_index_dict(), g.batch,
        attrs["pitch_spelling"], attrs["key_signature"], g.num_target_nodes,
    )
    ckpt = ocp.StandardCheckpointer()
    params = ckpt.restore(os.path.abspath(os.path.join(checkpoint_dir, tag)), params0)
    return model, params, cfg


SCORE_EXTENSIONS = (".musicxml", ".xml", ".mxl", ".krn", ".kern")


def main(argv=None) -> None:
    args = get_parser().parse_args(argv)
    if bool(args.score) == bool(args.score_dir):
        raise SystemExit("exactly one of --score / --score_dir is required")
    from analysisgnn_tpu.data.musicxml import load_score
    from analysisgnn_tpu.inference.predict import (
        decode_predictions,
        export_predictions_csv,
        export_roman_numerals_to_musicxml,
        predict_score_ids,
    )

    ckpt_dir = resolve_checkpoint(
        args.checkpoint_dir, args.checkpoint, args.artifacts_dir
    )
    model, params, cfg = load_model_and_params(
        ckpt_dir, args.checkpoint, conv_impl=args.conv_impl,
        hgt_stage_dtype=args.hgt_stage_dtype
    )
    tasks = args.tasks.split(",") if args.tasks else None

    if args.score_dir:
        paths = sorted(
            os.path.join(r, f)
            for r, _d, fs in os.walk(args.score_dir)
            for f in fs
            if f.lower().endswith(SCORE_EXTENSIONS)
        )
        if not paths:
            raise SystemExit(f"no score files under {args.score_dir}")
        # factor <= 1 (incl. the documented 0) disables bucketing
        bucket = args.bucket_factor if args.bucket_factor > 1.0 else None
    else:
        paths = [args.score]
        bucket = None  # single score: exact shapes, no padding waste

    if args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)
    feature_type = cfg.get("feature_type", "simple").replace("simple", "voice")
    if args.partition_devices and (cfg.get("add_beats") or cfg.get("add_measures")):
        raise SystemExit(
            "--partition_devices covers note-node model configs only "
            "(this checkpoint was trained with beat/measure nodes)"
        )
    for path in paths:
        parsed = load_score(path)
        if args.partition_devices:
            from analysisgnn_tpu.inference.predict import predict_score_partitioned

            probs = predict_score_partitioned(
                model, params, parsed.note_array, tasks=tasks,
                feature_type=feature_type,
                num_devices=args.partition_devices,
                ids_only=True,
            )
        else:
            # ids-only device decode: the exports below consume class ids,
            # so skip the full [N, C] probability transfer (predict_score
            # remains the API for probability consumers)
            probs = predict_score_ids(
                model,
                params,
                parsed.note_array,
                measures=parsed.measures,
                tasks=tasks,
                feature_type=feature_type,
                add_beats=cfg.get("add_beats", False),
                add_measures=cfg.get("add_measures", False),
                bucket_factor=bucket,
            )
        decoded = decode_predictions(probs)
        if args.score_dir and args.output_dir:
            # flatten into output_dir without basename collisions across
            # subdirectories: a/x.xml and b/x.xml must not overwrite
            rel = os.path.relpath(path, args.score_dir)
            base = os.path.splitext(rel)[0].replace(os.sep, "__")
            out_csv = os.path.join(args.output_dir, f"{base}_analysis.csv")
        elif args.score_dir:
            base = os.path.splitext(os.path.basename(path))[0]
            out_csv = os.path.join(
                os.path.dirname(path), f"{base}_analysis.csv"
            )
        else:
            base = os.path.splitext(os.path.basename(path))[0]
            out_csv = args.output_csv or f"{base}_analysis.csv"
        export_predictions_csv(out_csv, parsed.note_array, decoded)
        print(f"wrote {out_csv}")
        if args.score_dir:
            if args.export_musicxml:
                out_xml = os.path.join(
                    os.path.dirname(out_csv), f"{base}_rna.musicxml"
                )
                export_roman_numerals_to_musicxml(
                    out_xml, parsed.note_array, decoded
                )
                print(f"wrote {out_xml}")
        elif args.output_musicxml:
            export_roman_numerals_to_musicxml(
                args.output_musicxml, parsed.note_array, decoded
            )
            print(f"wrote {args.output_musicxml}")


if __name__ == "__main__":
    main()
