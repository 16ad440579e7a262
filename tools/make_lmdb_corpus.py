"""Materialize the procedural corpus as a reference-layout LMDB tile corpus.

VERDICT r2 item 3 asks for proof that the *production* data plane — LMDB
store -> host decode -> device (the path the reference exercises per step,
``read_data.py:248-253``) — can feed training at reference scale, not just
the on-device synthetic renderer. This tool writes that corpus: one
``{out}/{slide}/{slide}.db`` per slide (native LMDB writer, lz4-framed
pickled ``(name, bytes, shape)`` BGR values + ``__keys__`` index — the exact
format ``cli/tile.py`` produces and ``StreamingPatchBatches`` consumes) plus
``expression.csv`` (``wsi_file_name`` + 19,198 ``rna_`` columns, the GTEx CSV
shape from ``read_data.py:374-465``).

Tiles are bit-identical to the on-device renderer's (same SyntheticCorpus
seed, same (slide, tile) key scheme) so data-plane runs are directly
comparable with the synthetic-input quality runs. Rendering runs on host CPU
(single-core box: 7-47 tiles/s depending on the VM generation — budget up to
hours for 200x600 and run it `nice`d alongside TPU work) so the TPU stays
free; the job is resumable per slide.

Usage:
  python tools/make_lmdb_corpus.py --slides 200 --tiles_per_slide 600 \
      --out runs/corpus
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # render on host; never touch the TPU

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--slides", type=int, default=200)
    p.add_argument("--tiles_per_slide", type=int, default=600)
    p.add_argument("--genes", type=int, default=19198)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--corpus_seed", type=int, default=0)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--out", default="runs/corpus")
    args = p.parse_args()

    import jax.numpy as jnp

    from rnagan_tpu.data.store import LMDBTileStore, LMDBTileWriter
    from rnagan_tpu.data.synthetic import SyntheticCorpus

    corpus = SyntheticCorpus(n_slides=args.slides, tiles_per_slide=args.tiles_per_slide,
                             n_genes=args.genes, size=args.size, seed=args.corpus_seed)
    os.makedirs(args.out, exist_ok=True)

    # expression CSV first (cheap): GTEx layout the RNA data layer expects
    csv_path = os.path.join(args.out, "expression.csv")
    if not os.path.exists(csv_path):
        import pandas as pd

        expr = np.asarray(corpus.expression, np.float32)
        df = pd.DataFrame(expr, columns=[f"rna_g{i}" for i in range(expr.shape[1])])
        df.insert(0, "wsi_file_name", [f"slide{(i):04d}" for i in range(args.slides)])
        df.to_csv(csv_path, index=False)
        print(f"[csv] {csv_path} ({expr.shape[0]} x {expr.shape[1]})", flush=True)

    @jax.jit
    def render_uint8(sl, ti):
        imgs = corpus.render(sl, ti)  # [-1, 1] RGB float32
        u8 = jnp.clip((imgs + 1.0) * 127.5 + 0.5, 0, 255).astype(jnp.uint8)
        return u8[..., ::-1]  # store BGR (tiler convention, data/tiler.py note)

    t_start = time.time()
    written = 0
    for s in range(args.slides):
        name = f"slide{s:04d}"
        slide_dir = os.path.join(args.out, name)
        db_path = os.path.join(slide_dir, f"{name}.db")
        if os.path.exists(db_path):
            try:  # resumability: accept only complete stores
                with LMDBTileStore(db_path) as st:
                    if len(st.keys()) == args.tiles_per_slide:
                        continue
            except Exception:
                pass
            import shutil

            shutil.rmtree(slide_dir, ignore_errors=True)
        os.makedirs(slide_dir, exist_ok=True)
        writer = LMDBTileWriter(db_path)
        for t0 in range(0, args.tiles_per_slide, args.batch):
            n = min(args.batch, args.tiles_per_slide - t0)
            sl = jnp.full((n,), s, jnp.int32)
            ti = jnp.arange(t0, t0 + n, dtype=jnp.int32)
            tiles = np.asarray(render_uint8(sl, ti))
            for j in range(n):
                writer.put_tile(f"{name}_patch_{t0 + j}", tiles[j])
        writer.close()
        written += 1
        if written % 5 == 0 or s == args.slides - 1:
            done = s + 1
            rate = written * args.tiles_per_slide / max(time.time() - t_start, 1e-9)
            eta = (args.slides - done) * args.tiles_per_slide / max(rate, 1e-9)
            print(f"[tile] slide {done}/{args.slides} ({rate:.0f} tiles/s, eta {eta / 60:.0f} min)",
                  flush=True)
    print(f"[done] {args.out}: {args.slides} slides x {args.tiles_per_slide} tiles "
          f"in {(time.time() - t_start) / 60:.1f} min", flush=True)


if __name__ == "__main__":
    main()
