"""Tiered KV pools: slots-at-fixed-HBM receipt (round-4 verdict item 7).

At a FIXED KV-memory budget, how many concurrent rows can one chip
decode, and at what aggregate tok/s? Uniform pools must allocate the
full model window per slot; tiered pools give short rows window-sized
caches (CachedDecoder(window=...)), so the same bytes hold ~2.5x the
rows when the workload is short-dominated.

Setup (0.9B int8w, model window 2048, bf16 KV): budget = the KV bytes
of `--uniform-slots` full-window slots. Within that budget:
  uniform : uniform-slots x w2048 (mixed young/aged rows)
  tiered  : a w2048 pool for the aged rows + a w512 pool filled with
            as many young rows as the remaining budget allows
Decode blocks chain per pool; the tiered variant dispatches its two
pools back-to-back (one device stream — times ADD, which is what a
tiered service pays). tok/s = total live rows * steps / wall.

Usage: python scripts/tiered_kv_receipt.py [--uniform-slots 8]
"""
import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--uniform-slots", type=int, default=8)
    ap.add_argument("--aged-slots", type=int, default=4)
    ap.add_argument("--short-window", type=int, default=512)
    ap.add_argument("--window", type=int, default=2048)
    ap.add_argument("--variant", default="base")
    ap.add_argument("--block", type=int, default=32)
    ap.add_argument("--nb", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax

    from simpleinfer_tpu import Engine, EngineConfig
    from simpleinfer_tpu.profiling import chip_speed_factor
    from simpleinfer_tpu.zoo import build_llama
    from simpleinfer_tpu.zoo.generate import CachedDecoder

    graph, _, _ = build_llama(args.variant, batch=1,
                              seq_len=args.window, vocab_size=32000)
    eng = Engine(EngineConfig(compute_dtype="bfloat16",
                              quant="int8w")).load_model(None,
                                                         graph=graph)
    print("engine loaded", file=sys.stderr, flush=True)

    def pool_bytes(dec, slots):
        caches = dec.init_cache(slots)
        b = sum(leaf.nbytes
                for leaf in jax.tree_util.tree_leaves(caches))
        del caches
        return b

    dec_full = CachedDecoder(eng, kv_dtype="bfloat16",
                             scratch_blocks=True, sample_cap=64)
    dec_short = CachedDecoder(eng, kv_dtype="bfloat16",
                              scratch_blocks=True, sample_cap=64,
                              window=args.short_window)
    per_full = pool_bytes(dec_full, 1)
    per_short = pool_bytes(dec_short, 1)
    budget = per_full * args.uniform_slots
    n_short = (budget - per_full * args.aged_slots) // per_short
    print(f"per-slot KV: w{args.window} {per_full / 1e6:.1f} MB, "
          f"w{args.short_window} {per_short / 1e6:.1f} MB; budget "
          f"{budget / 1e9:.2f} GB = {args.uniform_slots} uniform slots "
          f"OR {args.aged_slots} aged + {n_short} short tier slots "
          f"({args.aged_slots + n_short} rows, "
          f"{(args.aged_slots + n_short) / args.uniform_slots:.2f}x)",
          flush=True)

    key = jax.random.PRNGKey(0)
    aged_pos, young_pos = args.window - 300, 64

    def chain(dec, slots, pos0, steps_block, nb):
        t = np.full(slots, 0.0, np.float32)
        k = np.zeros(slots, np.int32)
        p = np.ones(slots, np.float32)
        cache = dec.init_cache(slots)
        last = np.ones(slots, np.int64)
        pos = np.asarray(pos0, np.int32).copy()
        toks = None
        t0 = time.perf_counter()
        for i in range(nb):
            toks, last, cache = dec.decode_block(
                last, pos, cache, key, 1 + i * steps_block, t, k, p,
                steps_block)
            pos = np.minimum(pos + steps_block, dec._window - 1)
        np.asarray(toks)
        dt = time.perf_counter() - t0
        del cache
        return dt

    # workload mix: aged rows + young rows. Uniform serves
    # uniform-slots rows (aged + young together in one pool); tiered
    # serves aged in the full pool and n_short young in the short pool.
    uni_pos = [aged_pos] * args.aged_slots + \
        [young_pos] * (args.uniform_slots - args.aged_slots)
    variants = {
        "uniform": lambda: chain(dec_full, args.uniform_slots,
                                 uni_pos, args.block, args.nb),
        "tiered": lambda: (chain(dec_full, args.aged_slots,
                                 [aged_pos] * args.aged_slots,
                                 args.block, args.nb)
                           + chain(dec_short, int(n_short),
                                   [young_pos] * int(n_short),
                                   args.block, args.nb)),
    }
    rows = {"uniform": args.uniform_slots,
            "tiered": args.aged_slots + int(n_short)}
    for name, fn in variants.items():   # compile out of band
        t0 = time.perf_counter()
        fn()
        print(f"compile {name}: {time.perf_counter() - t0:.0f} s",
              file=sys.stderr, flush=True)

    times = {n: [] for n in variants}
    for r in range(args.rounds):
        for name, fn in variants.items():
            times[name].append(fn())
        print("round %d: %s" % (r, "  ".join(
            f"{n} {times[n][-1]:.3f}s" for n in variants)), flush=True)
    factor = chip_speed_factor()
    print(f"chip_speed_factor {factor:.3f}", flush=True)
    tps = {}
    for name, ts in times.items():
        med = statistics.median(ts)
        tps[name] = rows[name] * args.nb * args.block / med
        print(f"{name}: {rows[name]} rows, {med:.3f} s / "
              f"{args.nb * args.block} steps = {tps[name]:.0f} tok/s "
              f"at the same {budget / 1e9:.2f} GB KV budget", flush=True)
    print(f"slots-at-fixed-HBM: {rows['tiered'] / rows['uniform']:.2f}x "
          f"rows, {tps['tiered'] / tps['uniform']:.2f}x aggregate "
          f"tok/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
