"""Deterministic per-domain Zipfian text fixture (VERDICT r10 item 6,
SURVEY §7 observation (b)).

The driver's synthetic ``documents`` table shares one tiny (~31-type)
vocabulary across all 20 sources, so every separation-dependent effect —
DSIR importance bias, model-based quality enrichment, reference-LM
perplexity separation — is milli-nat scale on the standard fixture by
construction.  This generator produces a corpus whose domains draw from
multi-thousand-type Zipfian vocabularies with partial overlap, giving
those pins real measured margins.

Design:

* every domain ``src`` owns ``vocab`` alphabetic types (``src`` prefix +
  base-26 rank) sampled Zipf(s=1.07) by rank; a fraction
  ``shared_frac`` of tokens draws from a shared cross-domain vocabulary
  of the same size — domains overlap (realistic) but differ (separable);
* the ``spam`` domain emits SHORT documents (fail the min_tokens gate →
  weak label 0) so a terms→label classifier has a vocabulary signal to
  learn; ``spam_long_probe_rows`` emits held-out docs with spam
  vocabulary but passing length — the enrichment probe;
* the ``newz`` domain's doc_ids avoid ``% 7 == 0`` so the reference-LM
  dims (built from the ``% 7`` slice) never see its vocabulary — the
  OOV/perplexity separation probe;
* everything is a pure function of ``(seed, ids)`` via md5 — no RNG
  state, no Python-version dependence, reproducible on any host.
"""

from __future__ import annotations

import bisect
import hashlib
import math

_LETTERS = "abcdefghijklmnopqrstuvwxyz"


def _u(seed: int, *parts) -> float:
    """Deterministic uniform in [0, 1) from md5 of the key tuple."""
    key = ":".join(str(p) for p in (seed, *parts))
    h = int(hashlib.md5(key.encode()).hexdigest()[:13], 16)
    return h / 16**13


def _b26(k: int) -> str:
    s = ""
    k += 1
    while k:
        k, r = divmod(k - 1, 26)
        s = _LETTERS[r] + s
    return s


def zipf_cdf(vocab: int, s: float = 1.07) -> list[float]:
    """Cumulative Zipf(s) weights over ranks 0..vocab-1."""
    w = [1.0 / (k + 1) ** s for k in range(vocab)]
    tot = sum(w)
    cdf, acc = [], 0.0
    for x in w:
        acc += x / tot
        cdf.append(acc)
    return cdf


def _draw(cdf: list[float], u: float) -> int:
    return min(bisect.bisect_left(cdf, u), len(cdf) - 1)


def _token(domain: str, cdf: list[float], seed: int, doc_id: int, pos: int,
           shared_frac: float) -> str:
    if _u(seed, "sh", doc_id, pos) < shared_frac:
        return "zz" + _b26(_draw(cdf, _u(seed, "zt", doc_id, pos)))
    return domain + _b26(_draw(cdf, _u(seed, "dt", doc_id, pos)))


def richtext_rows(
    n_docs: int = 600,
    sources: tuple[str, ...] = ("srca", "srcb", "srcc", "srcd", "newz", "spam"),
    vocab: int = 5000,
    shared_frac: float = 0.3,
    min_len: int = 40,
    max_len: int = 120,
    spam_len: int = 10,
    seed: int = 7,
) -> list[tuple[int, str, str, str]]:
    """(doc_id, lang, source, text) rows; deterministic in ``seed``.

    ``newz`` doc_ids skip ``% 7 == 0`` (reference-LM holdout); ``spam``
    docs are ``spam_len`` tokens (min_tokens gate fails → weak label 0).
    """
    cdf = zipf_cdf(vocab)
    rows = []
    doc_id = 0
    for i in range(n_docs):
        src = sources[i % len(sources)]
        if src == "newz":
            while doc_id % 7 == 0:
                doc_id += 1
        if src == "spam":
            n_tok = spam_len
        else:
            n_tok = min_len + int(
                _u(seed, "len", doc_id) * (max_len - min_len)
            )
        text = " ".join(
            _token(src, cdf, seed, doc_id, p, shared_frac)
            for p in range(n_tok)
        )
        rows.append((doc_id, "en", src, text))
        doc_id += 1
    return rows


def spam_long_probe_rows(
    n: int = 40,
    vocab: int = 5000,
    shared_frac: float = 0.3,
    n_tok: int = 60,
    seed: int = 7,
    id_base: int = 9_000_000,
) -> list[tuple[int, str, str, str]]:
    """Held-out probe docs: spam vocabulary, PASSING length — the
    classifier-enrichment probe (heuristics keep them; a terms-aware
    model should not)."""
    cdf = zipf_cdf(vocab)
    return [
        (
            id_base + i,
            "en",
            "spamprobe",
            " ".join(
                _token("spam", cdf, seed, id_base + i, p, shared_frac)
                for p in range(n_tok)
            ),
        )
        for i in range(n)
    ]


def richtext_df(spark, **kwargs):
    """The corpus as a Spark DataFrame (doc_id, lang, source, text)."""
    return spark.createDataFrame(
        richtext_rows(**kwargs), "doc_id bigint, lang string, source string, text string"
    )


if __name__ == "__main__":
    rows = richtext_rows()
    n_types = len({t for _, _, _, txt in rows for t in txt.split()})
    n_tok = sum(len(txt.split()) for _, _, _, txt in rows)
    print(f"{len(rows)} docs, {n_tok} tokens, {n_types} distinct types")
