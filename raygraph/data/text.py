"""Text analysis stages: token counts, quality scores, language id,
document fingerprints.  All are stateless/actor map_batches stages over the
documents table; regexes and stopword tables load once per actor.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

_WS = re.compile(r"\s+")
_PUNCT = re.compile(r"[.!?,;:]")
_WORD = re.compile(r"\w+")

# tiny per-language stopword tables for the n-gram/stopword heuristic
_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "den"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "que", "por"},
}


def token_count(ds, text_col="text", id_col="doc_id"):
    """(id, n_tokens): whitespace tokens of the trimmed text.

    Matches ``len(string_split_regex(trim(text), '\\s+'))`` in SQL semantics:
    an empty trimmed string still yields one (empty) token.
    """

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        toks = [len(_WS.split(t.strip())) for t in df[text_col].astype(str)]
        return pd.DataFrame(
            {id_col: df[id_col].to_numpy(), "n_tokens": np.array(toks, np.int64)}
        )

    return ds.map_batches(fn, batch_format="pandas")


def quality_scores(ds, text_col="text", id_col="doc_id"):
    """(id, n_chars, n_tokens, punct_count, upper_ratio) quality metrics.

    Deliberately SQL-replicable (length / regexp counts) so the driver's
    DuckDB oracle can verify it bit-for-bit; richer heuristics (stopword
    ratio, mean word length) live in ``language_id``/custom stages.
    """

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[text_col].astype(str)
        n_chars = texts.str.len().to_numpy(np.int64)
        n_tokens = np.array(
            [len(_WS.split(t.strip())) for t in texts], np.int64
        )
        punct = np.array([len(_PUNCT.findall(t)) for t in texts], np.int64)
        upper = np.array(
            [sum(1 for c in t if c.isupper()) for t in texts], np.int64
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            upper_ratio = np.where(n_chars > 0, upper / np.maximum(n_chars, 1), 0.0)
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "punct_count": punct,
                "upper_ratio": np.round(upper_ratio, 6),
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


class LanguageId:
    """Actor stage: stopword-vote language heuristic (tables built once)."""

    def __init__(self, text_col="text", id_col="doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.tables = {k: frozenset(v) for k, v in _STOPWORDS.items()}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        langs = []
        scores = []
        for t in df[self.text_col].astype(str):
            words = _WORD.findall(t.lower())[:200]
            best_lang, best = "unknown", 0
            for lang, table in self.tables.items():
                s = sum(1 for w in words if w in table)
                if s > best:
                    best_lang, best = lang, s
            langs.append(best_lang)
            scores.append(best / max(1, min(len(words), 200)))
        return pd.DataFrame(
            {
                self.id_col: df[self.id_col].to_numpy(),
                "lang_pred": langs,
                "lang_score": np.round(np.array(scores), 6),
            }
        )


def language_id(ds, text_col="text", id_col="doc_id", concurrency=(1, 4)):
    return ds.map_batches(
        LanguageId,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pandas",
        concurrency=concurrency,
    )


def fingerprint(ds, text_col="text", id_col="doc_id", window: int = 16):
    """(id, fp): winnowing-style rolling-hash fingerprint (min hash over
    byte windows) — document-identity sketch robust to small shifts."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        fps = []
        for t in df[text_col].astype(str):
            b = t.encode("utf-8", "ignore")
            if len(b) < window:
                fps.append(
                    int.from_bytes(hashlib.md5(b).digest()[:8], "little")
                    & 0x7FFFFFFFFFFFFFFF
                )
                continue
            arr = np.frombuffer(b, dtype=np.uint8)
            n = len(arr) - window + 1
            h = np.zeros(n, dtype=np.uint64)
            for i in range(window):
                h = h * np.uint64(1000003) + arr[i : i + n]
            fps.append(int(h.min() & np.uint64(0x7FFFFFFFFFFFFFFF)))
        return pd.DataFrame(
            {id_col: df[id_col].to_numpy(), "fp": np.array(fps, np.int64)}
        )

    return ds.map_batches(fn, batch_format="pandas")


def term_frequencies(ds, text_col="text", id_col="doc_id"):
    """(id, term, tf): per-document term counts over lowercase ``\\w+``
    tokens.  A document is one row, so tf is computed entirely map-side —
    no shuffle; this is the input to df/idf aggregation."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ids, terms, tfs = [], [], []
        for i, t in zip(df[id_col].to_numpy(), df[text_col].astype(str)):
            ws, counts = np.unique(_WORD.findall(t.lower()), return_counts=True)
            ids.append(np.full(len(ws), i))
            terms.append(ws)
            tfs.append(counts)
        if not ids:
            return pd.DataFrame(
                {id_col: df[id_col].iloc[:0], "term": pd.Series(dtype=object),
                 "tf": pd.Series(dtype=np.int64)}
            )
        return pd.DataFrame(
            {
                id_col: np.concatenate(ids),
                "term": np.concatenate(terms).astype(object),
                "tf": np.concatenate(tfs).astype(np.int64),
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


def tfidf_top_terms(ds, text_col="text", id_col="doc_id", k: int = 3,
                    num_buckets: int = 64):
    """Top-k terms per document by tf·idf, idf = ln(N / df).

    Three bounded stages: map-side term frequencies (tf is per-row, no
    shuffle), one bucketed aggregate for document frequencies, one
    bucketed join of df onto the (doc, term, tf) rows, and a per-doc
    top-k with map-side combine (``agg.grouped_topk``).  Scores are
    rounded to 6 decimals BEFORE ranking so the ordering (and the DuckDB
    oracle's) is exact; ties break on the term ascending.
    """
    from raygraph.agg import grouped_topk, hash_aggregate
    from raygraph.joins import hash_join

    N = ds.count()
    tf = term_frequencies(ds, text_col=text_col, id_col=id_col)
    tf = tf.materialize()  # consumed by both df-aggregation and the join
    df_counts = hash_aggregate(tf, ["term"], {"df": (None, "count")})
    joined = hash_join(tf, df_counts, on="term", num_buckets=num_buckets)

    def score(d: pd.DataFrame) -> pd.DataFrame:
        idf = np.log(float(N) / d["df"].to_numpy(np.float64))
        out = d[[id_col, "term"]].copy()
        out["tfidf"] = np.round(d["tf"].to_numpy(np.float64) * idf, 6)
        return out

    scored = joined.map_batches(score, batch_format="pandas")
    return grouped_topk(scored, [id_col], ["tfidf", "term"], k=k,
                        ascending=[False, True], num_buckets=num_buckets)


def bigram_pmi(ds, text_col="text", min_count: int = 5,
               num_buckets: int = 64, broadcast_limit: int = 20_000_000):
    """Corpus-wide bigram collocation scores (pointwise mutual
    information), the phrase-detection statistic of Mikolov et al. 2013:
    ``pmi = ln( (c12/B) / ((c1/N)·(c2/N)) )`` over consecutive token
    pairs, N = total tokens, B = total bigram occurrences.

    Stages, all bounded: map-side per-batch bigram/unigram count combine
    (only distinct-per-batch rows cross the wire), one bucketed aggregate
    each, two scalar sums, the vocab-sized unigram table broadcast once
    via ``ray.put`` (guarded by ``broadcast_limit``), and a vectorized
    per-batch PMI map.  Tokenization is whitespace-split on ``' '`` with
    empty tokens dropped — stated identically in the DuckDB oracle
    (``pipelines._bigram_pmi_oracle_sql``), whose float expression
    mirrors this one operation for operation.  PMI is rounded to 6
    decimals on emit.  Returns Dataset (w1, w2, c12:int64, pmi:float64)
    filtered to ``c12 >= min_count``.
    """
    import ray

    from raygraph.agg import hash_aggregate
    from raygraph.joins import broadcast_map_ref, lookup_broadcast

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        w1s, w2s, us = [], [], []
        for t in df[text_col].astype(str):
            toks = [w for w in t.split(" ") if w]
            us.append(np.asarray(toks, dtype=object))
            if len(toks) > 1:
                w1s.append(np.asarray(toks[:-1], dtype=object))
                w2s.append(np.asarray(toks[1:], dtype=object))
        uni = pd.Series(
            np.concatenate(us) if us else np.empty(0, object)
        ).value_counts()
        if w1s:
            big = (
                pd.DataFrame(
                    {"w1": np.concatenate(w1s), "w2": np.concatenate(w2s)}
                )
                .groupby(["w1", "w2"], sort=False)
                .size()
                .reset_index(name="n")
            )
        else:
            big = pd.DataFrame(
                {"w1": pd.Series(dtype=object), "w2": pd.Series(dtype=object),
                 "n": pd.Series(dtype=np.int64)}
            )
        # one frame per batch: unigram rows carry w2 = "" (never a token)
        return pd.concat(
            [
                big,
                pd.DataFrame(
                    {"w1": uni.index.to_numpy(object),
                     "w2": np.full(len(uni), "", dtype=object),
                     "n": uni.to_numpy(np.int64)}
                ),
            ],
            ignore_index=True,
        )

    agg = hash_aggregate(
        ds.map_batches(counts, batch_format="pandas"),
        ["w1", "w2"], {"n": ("n", "sum")}, num_buckets=num_buckets,
    ).materialize()

    import pyarrow.compute as pc

    uni_ds = agg.map_batches(
        lambda t: t.filter(pc.equal(t.column("w2"), "")).select(["w1", "n"]),
        batch_format="pyarrow",
    )
    big_ds = agg.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("w2"), "")),
        batch_format="pyarrow",
    )
    n_tok = int(uni_ds.sum("n"))
    n_big = int(big_ds.sum("n"))
    n_vocab = uni_ds.count()
    if n_vocab > broadcast_limit:
        raise NotImplementedError(
            "bigram_pmi broadcast unigram table exceeds broadcast_limit "
            f"({n_vocab} > {broadcast_limit}); the join fallback is the "
            "documented path (two joins.hash_join passes, as in tfidf)"
        )
    upd = uni_ds.to_pandas()  # vocab-sized by contract
    kv = broadcast_map_ref(upd.rename(columns={"w1": "k", "n": "v"}), "k", "v")

    def pmi_rows(df: pd.DataFrame) -> pa.Table:
        # Arrow out: explicit schema keeps empty blocks typed (no Ray
        # size-estimation noise on object columns)
        df = df[df["n"].to_numpy(np.int64) >= min_count]
        if not len(df):
            return pa.table(
                {"w1": pa.array([], pa.string()),
                 "w2": pa.array([], pa.string()),
                 "c12": pa.array([], pa.int64()),
                 "pmi_e6": pa.array([], pa.int64())}
            )
        m = ray.get(kv)
        c1 = lookup_broadcast(df["w1"].to_numpy(object), m).astype(np.float64)
        c2 = lookup_broadcast(df["w2"].to_numpy(object), m).astype(np.float64)
        c12 = df["n"].to_numpy(np.int64)
        # float expression mirrored verbatim in the SQL oracle
        pmi = np.log(
            (c12.astype(np.float64) / float(n_big))
            / ((c1 / float(n_tok)) * (c2 / float(n_tok)))
        )
        # gate column is a scaled integer with half-away-from-zero
        # rounding (matches DuckDB ROUND(x*1e6, 0)) — np.round is
        # half-to-even, which flaps the hash gate on representable ties
        y = pmi * 1e6
        t = np.trunc(y)
        pmi_e6 = np.where(
            np.abs(y - t) == 0.5, t + np.copysign(1.0, y), np.rint(y)
        ).astype(np.int64)
        return pa.table(
            {"w1": pa.array(df["w1"], pa.string()),
             "w2": pa.array(df["w2"], pa.string()),
             "c12": pa.array(c12, pa.int64()),
             "pmi_e6": pa.array(pmi_e6, pa.int64())}
        )

    return big_ds.map_batches(pmi_rows, batch_format="pandas")
