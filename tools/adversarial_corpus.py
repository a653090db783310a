"""Adversarial corpus builder: hostile `documents` rows + verbatim
copies of the other sf0.001 tables.

Why: the driver REGENERATES the corpus every round, and two classes of
latent cross-engine divergence have now been found that only a hostile
corpus exposes (round-7: 1-token docs crashing the bigram ops under
ANSI; newline text diverging the BPE oracle's '.'-regex; all-separator
docs turning list_sum into NULL). This corpus makes those failure
modes a standing gate instead of a per-incident discovery:

    python tools/adversarial_corpus.py            # build (idempotent)
    python tools/check_oracle.py --sf .scratch/adversarial [keys...]

Hostile rows: 1-token / 2-token / shingle-threshold-band docs,
newline / tab / CRLF whitespace, double spaces (empty split tokens),
leading+trailing spaces, unicode (accents, CJK, emoji), the BPE
separator glyph itself, an all-spaces doc, a repeated-token doc, a
long doc, and punctuation-heavy text — across several (lang, source)
combinations so lang-branching ops (DSIR, perplexity) see both the
'en' reference side and the scored pool side.

Hostile embeddings (same spirit for the vector tier): an all-zeros
vector (norm 0 — cosine divides by it), exact duplicates, a vector
and its negation (cosine -1), one-hot axes, and extreme-magnitude
values (1e-20 / 1e15 — float32 storage vs float64 accumulation), on
top of seeded-random filler so clustering ops still have structure.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from stellarsql_spark.catalog import TABLES, table_path

BASE = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, ".scratch", "adversarial")

# (text, lang, source) — doc_id assigned by position, n_chars derived.
HOSTILE: list[tuple[str, str, str]] = [
    ("hello", "en", "web"),                          # 1 token
    ("two tokens", "en", "web"),                     # 2 tokens (1 bigram)
    ("three token doc", "fr", "web"),                # below winnowing window
    ("four tokens right here", "en", "books"),       # still below w+k-1
    ("five tokens sit right here", "de", "web"),     # boundary band
    ("six little tokens sit right here", "en", "web"),      # first fingerprint
    ("a a a a a a a a", "en", "web"),                # repeated token
    ("line one\nline two\nline three", "en", "news"),        # newlines
    ("tab\tseparated\ttokens here", "fr", "web"),    # tabs inside tokens
    ("crlf\r\nline ending doc", "en", "web"),        # CRLF
    ("double  space produces empty token", "de", "books"),   # '' token
    (" leading and trailing spaces ", "en", "web"),  # edge empties
    ("café résumé naïve coöperate", "fr", "web"),    # accents
    ("中文 文本 处理 测试", "zh", "web"),                # CJK
    ("emoji 🚀 in 🎉 text", "en", "social"),          # astral-plane chars
    ("pilcrow ¶ glyph appears literally", "en", "web"),      # BPE separator
    ("   ", "en", "web"),                            # all spaces
    ("punct! marks? (lots); of: them, everywhere...", "en", "news"),
    ("the quick brown fox jumps over the lazy dog " * 40 + "end", "en", "books"),
    ("UPPER CASE AND MiXeD cAsE tOkEnS", "en", "web"),
    ("numbers 123 456 789 mixed 0 in", "en", "web"),
    ("single", "zh", "social"),                      # 1 token, non-en pool
    ("zwei worte", "de", "news"),                    # 2 tokens, non-en
    ("quote's and \"double\" quotes", "en", "web"),
    # r8: shared boilerplate block across >= 5 docs so the support-
    # floored association/boilerplate catalogs (PMI >= 5 co-docs,
    # boilerplate/CDC >= 3 docs) produce NON-EMPTY output here — a
    # 0-row pass is a vacuous gate.  Same 10-word aligned prefix +
    # unique tails (the tails keep the docs from being exact dups).
    ("terms of service apply all rights reserved contact us today alpha tail one", "en", "web"),
    ("terms of service apply all rights reserved contact us today beta tail two", "en", "news"),
    ("terms of service apply all rights reserved contact us today gamma tail three", "en", "web"),
    ("terms of service apply all rights reserved contact us today delta tail four", "fr", "books"),
    ("terms of service apply all rights reserved contact us today epsilon tail five", "en", "social"),
]


_DIM = 64


def _hostile_embeddings() -> pa.Table:
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal((56, _DIM)).astype(np.float32) * 0.2
    special = np.zeros((8, _DIM), dtype=np.float32)
    # 0: all-zeros (norm 0); 1 & 2: exact duplicates; 3: negation of 1;
    # 4 & 5: one-hot on different axes; 6: tiny magnitudes; 7: huge.
    special[1] = base[0]
    special[2] = base[0]
    special[3] = -base[0]
    special[4, 0] = 1.0
    special[5, 1] = 1.0
    special[6] = np.float32(1e-20)
    special[7] = np.float32(1e15)
    vecs = np.concatenate([special, base])
    n = len(vecs)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32())),
            "label": pa.array([i % 10 for i in range(n)], pa.int32()),
        }
    )


def build(out_dir: str = OUT) -> str:
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        if t in ("documents", "embeddings"):
            continue
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copyfile(table_path(BASE, t), dst)
    pq.write_table(_hostile_embeddings(), os.path.join(out_dir, "embeddings.parquet"))
    texts = [h[0] for h in HOSTILE]
    tab = pa.table(
        {
            "doc_id": pa.array(range(1, len(HOSTILE) + 1), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([h[1] for h in HOSTILE], pa.string()),
            "source": pa.array([h[2] for h in HOSTILE], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tab, os.path.join(out_dir, "documents.parquet"))
    return out_dir


if __name__ == "__main__":
    print(build())
