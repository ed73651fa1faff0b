"""``analysisgnn-tpu-predict`` — score-analysis inference CLI.

Parity with the reference ``analysisgnn-predict`` (analysisgnn/inference/
predict_analysis.py): resolve a checkpoint, parse a MusicXML score, run the
model, decode labels, export CSV and optionally a Roman-numeral MusicXML.
(W&B artifact resolution is replaced by local checkpoint paths — this build
is network-free.)
"""

from __future__ import annotations

import argparse
import json
import os


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Predict analysis for a score")
    p.add_argument("--score", type=str, required=True, help="MusicXML/.mxl path")
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints")
    p.add_argument("--checkpoint", type=str, default="best",
                   help="checkpoint tag inside checkpoint_dir (best/last/<task>_model)")
    p.add_argument("--tasks", type=str, default=None, help="comma list; default all")
    p.add_argument("--output_csv", type=str, default=None)
    p.add_argument("--output_musicxml", type=str, default=None,
                   help="write Roman-numeral annotation MusicXML here")
    return p


def load_model_and_params(checkpoint_dir: str, tag: str):
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
        logit_fusion=cfg.get("logit_fusion", False),
        encoder_type=cfg.get("model", "HybridGNN").lower(),
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


def main(argv=None) -> None:
    args = get_parser().parse_args(argv)
    from analysisgnn_tpu.data.musicxml import load_score
    from analysisgnn_tpu.inference.predict import (
        decode_predictions,
        export_predictions_csv,
        export_roman_numerals_to_musicxml,
        predict_score,
    )

    model, params, cfg = load_model_and_params(args.checkpoint_dir, args.checkpoint)
    parsed = load_score(args.score)
    tasks = args.tasks.split(",") if args.tasks else None
    probs = predict_score(
        model,
        params,
        parsed.note_array,
        measures=parsed.measures,
        tasks=tasks,
        feature_type=cfg.get("feature_type", "simple").replace("simple", "voice"),
        add_beats=cfg.get("add_beats", False),
        add_measures=cfg.get("add_measures", False),
    )
    decoded = decode_predictions(probs)
    base = os.path.splitext(os.path.basename(args.score))[0]
    out_csv = args.output_csv or f"{base}_analysis.csv"
    export_predictions_csv(out_csv, parsed.note_array, decoded)
    print(f"wrote {out_csv}")
    if args.output_musicxml:
        export_roman_numerals_to_musicxml(
            args.output_musicxml, parsed.note_array, decoded
        )
        print(f"wrote {args.output_musicxml}")


if __name__ == "__main__":
    main()
