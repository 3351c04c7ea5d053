"""Draft-model speculative decoding (greedy, lossless).

A small DRAFT model proposes K-1 tokens per round (one chained
decode_block dispatch — cheap: draft weights are a fraction of the
target's); the TARGET model scores all K positions in ONE
decode_chunk_verify dispatch (one target-weights read for up to K
accepted tokens — the decode step's dominant cost at the 0.9B scale is
the weight read, docs/PERF.md, so acceptance rate converts ~directly
into throughput). Greedy acceptance: the longest draft prefix matching
the target's own argmax stream is accepted, plus the target's
correction token at the first mismatch — the output is therefore
EXACTLY the target-only greedy stream (lossless; pinned by tests
token-for-token).

Rejection rollback is FREE in this framework: caches are static-shape
position-indexed pools whose entries past each row's `pos` are never
read before being overwritten (zoo/generate.CachedDecoder design), so
a rejected draft suffix just leaves stale entries behind. Both the
target and draft caches self-heal as accepted tokens are re-fed.

The reference (zpye/SimpleInfer) has no generation at all — this is
superset serving capability (SURVEY.md §5) built entirely on the two
public CachedDecoder substrates (decode_block, decode_chunk_verify).
"""
from __future__ import annotations

import numpy as np


class SpeculativeDecoder:
    """Greedy speculative decoding over two causal-LM engines.

    target_engine / draft_engine: engines built from the same
    tokenizer/vocab family (the draft's proposals index the target's
    vocabulary; vocab sizes must match). k: tokens per speculative
    round (1 draft block of k-1 proposals + 1 target verify of k
    positions). Per-row acceptance: a batch mixes rows at different
    depths, like the serving pool.

    Deployment note (measured, docs/PERF.md): the round loop is
    HOST-coupled (acceptance gates the next feed), so on a
    relay-attached chip (~30 ms RTT) it loses ~10x to the chained
    block decoder even at acceptance 0.93; it pays on PCIe-class
    hosts. Same-engine acceptance is ~0.93 on TPU, not 1.0: the
    draft's per-step path and the chunk-verify path differ at ulp
    and near-tie argmaxes flip (losslessness of the OUTPUT is
    unaffected — it is always the verify path's greedy stream).

    usage:
        spec = SpeculativeDecoder(target_eng, draft_eng, k=4)
        out = spec.generate(prompt_ids, steps=64, eos_id=2)
        spec.stats  # rounds / drafted / accepted (acceptance rate)
    """

    def __init__(self, target_engine, draft_engine, k: int = 4,
                 kv_dtype: str | None = None,
                 scratch_blocks: bool = False):
        from .generate import CachedDecoder

        if k < 2:
            raise ValueError(f"k must be >= 2 (one draft token + the "
                             f"bonus), got {k}")
        self.k = int(k)
        self.target = CachedDecoder(target_engine, kv_dtype=kv_dtype,
                                    scratch_blocks=scratch_blocks)
        self.draft = CachedDecoder(draft_engine)
        if self.draft._window < self.target._window:
            raise ValueError(
                f"draft window {self.draft._window} must cover the "
                f"target window {self.target._window} (caches are "
                f"position-indexed)")
        self.stats = {"rounds": 0, "drafted": 0, "accepted": 0}

    @property
    def acceptance(self) -> float:
        return self.stats["accepted"] / max(1, self.stats["drafted"])

    def generate(self, prompt_ids, steps: int,
                 eos_id: int | None = None) -> np.ndarray:
        """Greedy-decode `steps` tokens after each prompt row —
        token-identical to CachedDecoder(target).generate(greedy),
        in ~steps/(1 + acceptance*(k-1)) target dispatch rounds.

        prompt_ids: [N, P]; returns [N, P + emitted] (rows frozen
        after eos_id when given, like CachedDecoder.generate)."""
        import jax

        prompt = np.asarray(prompt_ids)
        n, p = prompt.shape
        if p + steps > self.target._window:
            raise ValueError(f"prompt ({p}) + steps ({steps}) exceeds "
                             f"the target window {self.target._window}")
        k = self.k
        key = jax.random.PRNGKey(0)
        zeros = np.zeros(n, np.float32)
        izeros = np.zeros(n, np.int32)
        ones = np.ones(n, np.float32)

        # prefill BOTH models on the prompt (2 dispatches); the
        # target's greedy sample is the first accepted token
        window = np.zeros((n, self.target._window), np.float32)
        window[:, :p] = prompt
        lengths = np.full(n, p)
        t0, t_cache = self.target.prefill_sample(
            window, lengths, key, 0, zeros, izeros, ones)
        d_win = np.zeros((n, self.draft._window), np.float32)
        d_win[:, :p] = prompt
        _, d_cache = self.draft.prefill_sample(
            d_win, lengths, key, 0, zeros, izeros, ones)

        total = p + steps
        buf = np.zeros((n, total), np.int64)
        buf[:, :p] = prompt
        cur = np.full(n, p, np.int64)     # next index to fill, per row
        buf[np.arange(n), np.minimum(cur, total - 1)] = np.asarray(t0)
        done = np.zeros(n, bool)
        if eos_id is not None:
            done |= buf[np.arange(n), cur] == eos_id
        cur += 1

        while True:
            live = ~done & (cur < total)
            if not live.any():
                break
            # last accepted token / its position, per row (finished
            # rows decode garbage that is discarded, the decode_block
            # waste profile)
            last_idx = np.minimum(cur - 1, total - 1)
            last_tok = buf[np.arange(n), last_idx]
            pos = last_idx.astype(np.int32)

            # 1) draft proposes greedy tokens (ONE block dispatch of k
            # steps — the kth sample is discarded, but running k steps
            # means the draft has FED/appended every position a full
            # acceptance can reach, so its cache never develops holes)
            d_toks, _d_last, d_cache = self.draft.decode_block(
                last_tok, pos, d_cache, key, 1, zeros, izeros, ones, k)
            d_np = np.asarray(d_toks)                     # [N, k]

            # 2) target verifies all k positions in ONE dispatch
            verify_in = np.concatenate(
                [last_tok[:, None], d_np[:, :k - 1]], axis=1)  # [N, k]
            g, t_cache = self.target.decode_chunk_verify(
                verify_in, pos, t_cache)
            g_np = np.asarray(g)                          # [N, k]

            # 3) per-row acceptance: longest draft prefix matching the
            # target's own greedy stream, then the target's correction/
            # bonus token — the emitted stream IS target-greedy
            self.stats["rounds"] += 1
            for i in range(n):
                if not live[i]:
                    continue
                emit = []
                # every round makes k-1 proposals for a live row,
                # whether or not an early mismatch stops examining them
                # (acceptance = accepted / ALL proposals made)
                self.stats["drafted"] += k - 1
                for j in range(k):
                    emit.append(int(g_np[i, j]))
                    if j < k - 1 and d_np[i, j] == g_np[i, j]:
                        self.stats["accepted"] += 1
                        continue
                    break
                for tok in emit:
                    if cur[i] >= total:
                        break
                    buf[i, cur[i]] = tok
                    cur[i] += 1
                    if eos_id is not None and tok == eos_id:
                        done[i] = True
                        break
                if cur[i] >= total:
                    done[i] = True

        if eos_id is None:
            return buf
        end = int(cur.max())
        return buf[:, :end]
