"""Deterministic ADVERSARIAL corpus generator — r4 verdict action #1.

The oracle gates have only ever run on well-behaved synthetic corpora;
every cap / star-link / census guard claims oracle-identical semantics
under degeneracy, but no gate had executed those paths. This builds a
corpus dir with the same 10 tables the driver registers, where:

- documents gains a GIANT identical-text group: 10,000 copies of one
  text, all ids ≡ 7 (mod 50) so ONE host also owns ~95% of the
  synthesized pages (hot-host skew through the whole pages family);
- degenerate text families: empty, NUL bytes, NBSP/zero-width
  whitespace, 100k-char documents, single-char documents;
- events gains a hot user (20k events = 2/3 of all rows on one
  user_id) plus a block of IDENTICAL timestamps (tie-break paths);
- embeddings gains 500 identical vectors (exact-dup cluster larger
  than any k) and 5 all-zero vectors (cosine division guards);
- adversarial sources use NUMERIC suffixes (src97/src98) because
  several oracles parse the suffix as an integer;
- every derived column (n_chars) is recomputed so table invariants
  hold; TPC-H tables copy through unchanged.

Everything is seedless and order-deterministic: the gate must be
reproducible bit for bit.

Usage:
    python tools/adversarial_corpus.py [--base /root/testdata/sf0.01]
                                       [--out /tmp/graft_adversarial]
then:
    python tools/replica_gate.py --sf /tmp/graft_adversarial
"""

import argparse
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPY_TABLES = ("region nation customer supplier part orders "
               "lineitem").split()

# long enough for 5-shingles, words from the synthetic vocabulary so
# text-stats gates stay discriminative
GIANT_TEXT = ("the giant boilerplate row scan table value hash merge "
              "batch sort window key fast slow line part agg spark "
              "dup big the giant boilerplate row scan table value")

N_GIANT = 10_000          # override with --giant for pair-quadratic gates
N_HOT_EVENTS = 20_000
N_DUP_VECS = 500


def _docs_table(base_dir: str, n_giant: int = None) -> pa.Table:
    base = pq.read_table(f"{base_dir}/documents.parquet")
    ids, texts, langs, srcs = [], [], [], []

    def fam(i0, n, text_fn, lang="en", src="src98"):
        for i in range(n):
            ids.append(i0 + i)
            texts.append(text_fn(i))
            langs.append(lang)
            srcs.append(src)

    # giant dup group on one host: ids ≡ 7 (mod 50). The whole id
    # space stays BELOW 1e6: several queries derive secondary corpora
    # at doc_id + 1e6 / + 3e6 and assume base ids never reach there.
    for i in range(N_GIANT if n_giant is None else n_giant):
        ids.append(100_007 + 50 * i)
        texts.append(GIANT_TEXT)
        langs.append("en")
        srcs.append("src97")
    fam(700_000, 10, lambda i: "")                       # empty
    fam(700_100, 10,
        lambda i: f"alpha\x00beta gamma\x00delta {i} nul")  # NUL bytes
    fam(700_200, 10,
        lambda i: ("alpha\u00a0beta\u200bgamma\u00a0 %d" % i
                   + " \u2009thin\u00a0space"))     # NBSP/ZWSP/thin
    fam(700_300, 5,
        lambda i: " ".join(f"tok{i}w{j}" for j in range(12_000)))
    fam(700_400, 10, lambda i: "x")                       # 1 char
    extra = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(srcs, pa.string()),
        "n_chars": pc.utf8_length(
            pa.array(texts, pa.string())).cast(pa.int64()),
    })
    out = pa.concat_tables(
        [base.select(extra.column_names), extra]).combine_chunks()
    assert pc.all(pc.equal(pc.utf8_length(out.column("text")),
                           out.column("n_chars"))).as_py()
    assert len(set(out.column("doc_id").to_pylist())) == out.num_rows
    assert pc.max(out.column("doc_id")).as_py() < 1_000_000
    return out


def _events_table(base_dir: str) -> pa.Table:
    base = pq.read_table(f"{base_dir}/events.parquet")
    eid0 = pc.max(base.column("event_id")).as_py() + 1
    ts0 = np.datetime64("2024-01-05T00:00:00.000000", "us")
    types = ["view", "click", "purchase", "view", "click", "error",
             "view", "signup"]
    n = N_HOT_EVENTS
    ids = eid0 + np.arange(n, dtype=np.int64)
    # hot user 42: one event per second for ~5.5 hours of corpus time
    ts = ts0 + np.arange(n).astype("timedelta64[s]").astype(
        "timedelta64[us]")
    # plus 100 rows with the SAME timestamp (tie-break paths)
    ts[-100:] = ts0 + np.timedelta64(999, "s")
    hot = pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(np.full(n, 42, np.int64)),
        "event_type": pa.array([types[i % len(types)]
                                for i in range(n)], pa.string()),
        "value": pa.array((np.arange(n) % 100).astype(np.float64)),
        "props": pa.array(['{"k": %d}' % (i % 7) for i in range(n)],
                          pa.string()),
    })
    return pa.concat_tables(
        [base.select(hot.column_names), hot]).combine_chunks()


def _embeddings_table(base_dir: str) -> pa.Table:
    base = pq.read_table(f"{base_dir}/embeddings.parquet")
    dim = len(base.column("embedding")[0])
    vid0 = pc.max(base.column("vec_id")).as_py() + 1
    one = [round(0.1 + 0.01 * (j % 7), 6) for j in range(dim)]
    vecs = [one] * N_DUP_VECS + [[0.0] * dim] * 5
    extra = pa.table({
        "vec_id": pa.array(vid0 + np.arange(len(vecs), dtype=np.int64)),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([7] * N_DUP_VECS + [3] * 5, pa.int32()),
    })
    return pa.concat_tables(
        [base.select(extra.column_names), extra]).combine_chunks()


def build(base_dir: str, out_dir: str, n_giant: int = None) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    for t in COPY_TABLES:
        shutil.copyfile(f"{base_dir}/{t}.parquet",
                        f"{out_dir}/{t}.parquet")
    stats = {}
    for name, fn in (("documents",
                      lambda d: _docs_table(d, n_giant)),
                     ("events", _events_table),
                     ("embeddings", _embeddings_table)):
        tbl = fn(base_dir)
        pq.write_table(tbl, f"{out_dir}/{name}.parquet")
        stats[name] = tbl.num_rows
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/graft_adversarial")
    ap.add_argument("--giant", type=int, default=None,
                    help="size of the identical-text group (default "
                         "10000; use ~600 for pair-quadratic gates "
                         "whose SQL oracle emits O(giant^2) rows)")
    args = ap.parse_args()
    print(build(args.base, args.out, args.giant))


if __name__ == "__main__":
    main()
