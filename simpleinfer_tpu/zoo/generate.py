"""Autoregressive generation driver for causal LMs (zoo.build_gpt).

The engine compiles ONE static-shape program (SURVEY.md §3.2 — the
XLA analog of the reference's fixed CGraph pipeline), so generation
runs as fixed-window re-forwards: the token buffer stays [N, L] with
right padding, each step writes the argmax of the logits at the last
real position, and every call hits the same compiled executable — no
recompiles, no dynamic shapes. The causal mask baked into build_gpt
guarantees padding positions cannot influence earlier logits.

This is the inference-engine shape of sampling (prefill-style compute
per step). A KV-cache decode path would change per-step cost from
O(L^2) to O(L) — tracked as future work in docs/ROADMAP.md.
"""
from __future__ import annotations

import numpy as np


def greedy_generate(engine, prompt_ids, steps: int, *,
                    input_name: str | None = None,
                    output_name: str | None = None,
                    eos_id: int | None = None) -> np.ndarray:
    """Greedy-decode `steps` tokens after each prompt row.

    prompt_ids: [N, P] int array, P <= the model's compiled seq_len L;
    P + steps must fit in L. Returns [N, P + steps] (or shorter rows
    frozen after eos_id when given).
    """
    input_name = input_name or engine.input_names[0]
    output_name = output_name or engine.output_names[0]
    prompt = np.asarray(prompt_ids)
    if prompt.ndim != 2:
        raise ValueError(f"prompt_ids must be [N, P], got {prompt.shape}")
    n, p = prompt.shape

    # compiled window length from the program's input declaration
    spec = next(s for s in engine.program.inputs if s.name == input_name)
    if not spec.shape or len(spec.shape) != 2:
        raise ValueError(
            f"input {input_name!r} is not a declared [N, L] token "
            f"buffer: {spec.shape}")
    length = int(spec.shape[1])
    if p + steps > length:
        raise ValueError(f"prompt ({p}) + steps ({steps}) exceeds the "
                         f"compiled window {length}")

    buf = np.zeros((n, length), np.float32)
    buf[:, :p] = prompt
    done = np.zeros(n, bool)
    cur = p
    for _ in range(steps):
        logits = engine.run({input_name: buf})[output_name]
        nxt = np.argmax(logits[:, cur - 1, :], axis=-1)
        buf[:, cur] = np.where(done, 0, nxt)
        if eos_id is not None:
            done |= (nxt == eos_id)
        cur += 1
        if eos_id is not None and done.all():
            break
    return buf[:, :cur].astype(np.int64)
