"""CLI end-to-end over a file-based raw_dir: MusicXML cadence corpus + DLC
TSV corpus, with transposition augmentation and caching."""

import os

import numpy as np
import pytest

from tests.test_corpus_datamodule import make_dlc_df
from tests.test_musicxml import SCORE


@pytest.fixture()
def raw_dir(tmp_path):
    # cadence corpus: MusicXML scores
    cad = tmp_path / "raw" / "cadence"
    cad.mkdir(parents=True)
    for i in range(3):
        (cad / f"piece{i}.xml").write_text(SCORE)
    # "all" corpus: DLC TSVs
    alld = tmp_path / "raw" / "all"
    alld.mkdir(parents=True)
    for i in range(3):
        make_dlc_df(40).to_csv(alld / f"dlc{i}.tsv", sep="\t", index=False)
    return str(tmp_path / "raw")


@pytest.mark.slow
def test_cli_train_on_raw_dir(raw_dir, tmp_path):
    from analysisgnn_tpu.cli import train as train_cli

    ckpt = str(tmp_path / "ckpt")
    train_cli.main([
        "--raw_dir", raw_dir, "--do_train",
        "--num_layers", "1", "--hidden_channels", "16", "--out_channels", "8",
        "--num_epochs", "1,1", "--subgraph_size", "16", "--batch_size", "20",
        "--main_tasks", "all,cadence", "--cl_training",
        "--random_split",
        "--use_transpositions",
        "--checkpoint_dir", ckpt, "--max_steps_per_epoch", "2",
    ])
    assert os.path.exists(os.path.join(ckpt, "last"))
    assert os.path.exists(os.path.join(ckpt, "all_model"))
    # cache populated: second run loads from cache
    cache = os.path.join(raw_dir, ".cache")
    assert os.path.isdir(cache) and len(os.listdir(cache)) > 0


def test_cli_test_eval_every_writes_curve(raw_dir, tmp_path):
    """--test_eval_every N appends test-split metric rows to
    <ckpt>/test_curve.jsonl with the keys scripts/crossover_table.py aligns
    on (global_epoch, steps, 'all/<task>_{acc,f1}')."""
    import json

    from analysisgnn_tpu.cli import train as train_cli

    ckpt = str(tmp_path / "ckpt_curve")
    train_cli.main([
        "--raw_dir", raw_dir, "--do_train",
        "--num_layers", "1", "--hidden_channels", "16", "--out_channels", "8",
        "--num_epochs", "2", "--subgraph_size", "16", "--batch_size", "20",
        "--main_tasks", "all",
        # transpositions expand 3 pieces to >=24 samples so the random
        # 20% test split is non-empty (int(3*0.2)=0 rows -> metric-less
        # curve rows otherwise)
        "--random_split", "--use_transpositions",
        "--checkpoint_dir", ckpt, "--max_steps_per_epoch", "2",
        "--test_eval_every", "1",
    ])
    curve_path = os.path.join(ckpt, "test_curve.jsonl")
    assert os.path.exists(curve_path)
    rows = [json.loads(l) for l in open(curve_path) if l.strip()]
    assert [r["global_epoch"] for r in rows] == [1, 2]
    assert rows[0]["steps"] == 2 and rows[1]["steps"] == 4
    metric_keys = [k for k in rows[0] if "/" in k and not k.endswith("__w")]
    assert any(k.endswith("_acc") for k in metric_keys)
    assert all(k.startswith("all/") for k in metric_keys), metric_keys[:5]


def test_corpus_transpositions_expand(raw_dir):
    from analysisgnn_tpu.data.corpus import CorpusConfig, DLCTsvCorpus

    cfg = CorpusConfig(cache_dir=os.path.join(raw_dir, ".cache2"), transpose=True)
    corpus = DLCTsvCorpus(cfg, os.path.join(raw_dir, "all")).load()
    # 3 pieces × up to 12 transpositions (some intervals may drop out)
    assert len(corpus.samples) >= 3 * 8
    transpositions = {s.transposition for s in corpus.samples}
    assert "P1" in transpositions and len(transpositions) >= 8
    assert not corpus.errors, corpus.errors
