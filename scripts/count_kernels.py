"""Count post-fusion HLO instructions in the compiled train step per encoder.

On the tunnel runtime the step is overhead-bound (~1.6 ms fixed cost per
dispatched kernel — scripts/bench_micro2.py), so the executed-kernel count of
the compiled step predicts step time far better than FLOPs.  This probe
AOT-compiles the full train step for each encoder and prints the number of
top-level (post-fusion) instructions, broken down by opcode family.

    python scripts/count_kernels.py [HybridGNN HGT MetricalGNN]
"""

from __future__ import annotations

import collections
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from bench_encoders import build_workload  # noqa: E402

    from analysisgnn_tpu.core.graph import NOTE, metadata
    from analysisgnn_tpu.models.analysis import AnalysisGNN
    from analysisgnn_tpu.train.schedules import warmup_cosine_schedule
    from analysisgnn_tpu.train.state import create_train_state, make_optimizer
    from analysisgnn_tpu.train.step import StepConfig, make_train_step

    tasks, batches = build_workload()
    batch = batches[0]
    attrs = batch.node_attrs[NOTE]
    args = (
        batch.x_dict(), batch.edge_index_dict(), batch.batch,
        attrs["pitch_spelling"], attrs["key_signature"], batch.num_target_nodes,
    )
    nodes, edges_meta = metadata(True, True)
    for enc in sys.argv[1:] or ["HybridGNN", "HGT", "MetricalGNN"]:
        model = AnalysisGNN(
            metadata=(nodes, edges_meta),
            in_channels=25,
            hidden_channels=256,
            out_channels=128,
            task_dict=tasks,
            num_layers=3,
            dropout=0.3,
            encoder_type=enc.lower(),
        )
        params = model.init(jax.random.PRNGKey(0), *args)
        opt = make_optimizer(warmup_cosine_schedule(5e-3, total_steps=1000))
        state = create_train_state(params, len(tasks), opt, jax.random.PRNGKey(1))
        step_cfg = StepConfig(
            task_dict=tasks,
            active_tasks=tuple(t for t, _ in tasks),
            mt_strategy="wloss",
        )
        step = make_train_step(model, opt, step_cfg)
        compiled = step.lower(state, batch).compile()
        text = compiled.as_text()
        # entry computation = the ENTRY block; count one line per instruction
        m = re.search(r"ENTRY [^{]+\{(.*?)\n\}", text, re.S)
        body = m.group(1) if m else text
        ops = collections.Counter()
        n = 0
        for line in body.splitlines():
            line = line.strip()
            mm = re.match(r"%?[\w.\-]+ = \S+ ([\w\-]+)\(", line)
            if not mm:
                continue
            op = mm.group(1)
            if op in ("parameter", "constant", "get-tuple-element", "tuple",
                      "bitcast", "copy"):
                continue
            ops[op] += 1
            n += 1
        print(json.dumps({"encoder": enc, "entry_instructions": n,
                          "top_ops": ops.most_common(12)}), flush=True)


if __name__ == "__main__":
    main()
