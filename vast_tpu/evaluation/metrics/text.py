"""Caption metric primitives: PTB-ish tokenizer, BLEU, ROUGE-L, CIDEr.

Pure-Python replacements for the reference's vendored pycocoevalcap
(evaluation_tools/caption_tools/), whose METEOR/PTBTokenizer shell out to
Java jars that are stripped from the snapshot (SURVEY §1.8). BLEU/ROUGE-L/
CIDEr follow the standard COCO-caption definitions (Papineni'02 with the
closest-reference brevity penalty; Lin'04 ROUGE-L F with beta=1.2;
Vedantam'15 CIDEr n=1..4, sigma=6, corpus IDF). METEOR is exposed as an
optional Java subprocess (metrics/meteor.py) and skipped when absent.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

_PUNCT = ["''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
          ".", "?", "!", ",", ":", "-", "--", "...", ";"]
# the Stanford tokenizer emits round/curly brackets as -LRB-/-RRB-/
# -LCB-/-RCB- (which the PUNCTUATIONS filter then removes); we see the
# raw characters
_PUNCT_SET = set(_PUNCT) | {"(", ")", "{", "}"}


def _split_clitics(t: str) -> list[str]:
    """Penn-Treebank clitic splitting: don't -> do n't, man's -> man 's,
    cannot -> can not, gonna -> gon na (edu.stanford.nlp PTBTokenizer)."""
    if t == "cannot":
        return ["can", "not"]
    if t in ("gonna", "wanna", "gotta", "lemme", "gimme"):
        return [t[:3], t[3:]]
    m = re.match(r"(.+?)(n't)$", t)
    if m and m.group(1):
        return [m.group(1), "n't"]
    m = re.match(r"(.+?)('(?:s|re|ve|ll|d|m))$", t)
    if m:
        return [m.group(1), m.group(2)]
    return [t]


def ptb_tokenize(text: str) -> list[str]:
    """Lowercase word tokenizer dropping the PTBTokenizer punctuation set.

    Approximates the Stanford PTBTokenizer pipeline used by pycocoevalcap
    (tokenizer/ptbtokenizer.py): lowercase, split words/punctuation,
    split PTB clitics, drop the PUNCTUATIONS list (no Java dependency).
    """
    text = text.lower().strip()
    text = re.sub(r"[\t\n\r]", " ", text)
    toks = re.findall(r"[a-z0-9]+(?:'[a-z]+)*|[^\sa-z0-9]", text)
    out = []
    for t in toks:
        if t in _PUNCT_SET:
            continue
        out.extend(_split_clitics(t))
    return out


def _ngrams(tokens: list[str], n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


def bleu(gts: dict, res: dict, max_n: int = 4) -> list[float]:
    """Corpus BLEU_1..max_n, COCO style (closest-length brevity penalty)."""
    clipped = [0] * max_n
    totals = [0] * max_n
    cand_len = 0
    ref_len = 0
    for key, hyps in res.items():
        hyp = hyps[0]
        refs = gts[key]
        cand_len += len(hyp)
        # closest reference length (ties -> shorter)
        ref_len += min((abs(len(r) - len(hyp)), len(r)) for r in refs)[1]
        for n in range(1, max_n + 1):
            h_ng = _ngrams(hyp, n)
            max_ref = Counter()
            for r in refs:
                for ng, c in _ngrams(r, n).items():
                    max_ref[ng] = max(max_ref[ng], c)
            totals[n - 1] += max(len(hyp) - n + 1, 0)
            clipped[n - 1] += sum(min(c, max_ref[ng])
                                  for ng, c in h_ng.items())
    bp = 1.0 if cand_len > ref_len else math.exp(1 - ref_len / max(cand_len, 1))
    out = []
    log_sum = 0.0
    tiny, small = 1e-15, 1e-9
    for n in range(max_n):
        p = (clipped[n] + tiny) / (totals[n] + small)
        log_sum += math.log(p)
        out.append(bp * math.exp(log_sum / (n + 1)))
    return out


def _lcs(a: list[str], b: list[str]) -> int:
    if not a or not b:
        return 0
    dp = [0] * (len(b) + 1)
    for x in a:
        prev = 0
        for j, y in enumerate(b, 1):
            cur = dp[j]
            dp[j] = prev + 1 if x == y else max(dp[j], dp[j - 1])
            prev = cur
    return dp[-1]


def rouge_l(gts: dict, res: dict, beta: float = 1.2) -> float:
    """COCO ROUGE-L: max precision and max recall are taken over the refs
    SEPARATELY before the F-combination (pycocoevalcap rouge.py:70-74),
    possibly from different references."""
    scores = []
    for key, hyps in res.items():
        hyp = hyps[0]
        prec_max = rec_max = 0.0
        for ref in gts[key]:
            l = _lcs(hyp, ref)
            prec_max = max(prec_max, l / len(hyp) if hyp else 0.0)
            rec_max = max(rec_max, l / len(ref) if ref else 0.0)
        if prec_max and rec_max:
            best = ((1 + beta ** 2) * prec_max * rec_max) \
                / (rec_max + beta ** 2 * prec_max)
        else:
            best = 0.0
        scores.append(best)
    return sum(scores) / max(len(scores), 1)


def cider(gts: dict, res: dict, n: int = 4, sigma: float = 6.0) -> float:
    """CIDEr-D style scoring as in pycocoevalcap's cider_scorer."""
    # document frequencies over reference sets
    df = [defaultdict(float) for _ in range(n)]
    for refs in gts.values():
        seen = [set() for _ in range(n)]
        for ref in refs:
            for k in range(n):
                seen[k].update(_ngrams(ref, k + 1).keys())
        for k in range(n):
            for ng in seen[k]:
                df[k][ng] += 1.0
    log_ref = math.log(max(len(gts), 1))

    def vec(tokens):
        out = []
        norms = []
        for k in range(n):
            c = _ngrams(tokens, k + 1)
            v = {}
            for ng, cnt in c.items():
                idf = log_ref - math.log(max(df[k][ng], 1.0))
                v[ng] = cnt * idf
            out.append(v)
            norms.append(math.sqrt(sum(x * x for x in v.values())))
        return out, norms

    scores = []
    for key, hyps in res.items():
        hyp = hyps[0]
        hv, hn = vec(hyp)
        total = 0.0
        for ref in gts[key]:
            rv, rn = vec(ref)
            delta = len(hyp) - len(ref)
            sim = 0.0
            for k in range(n):
                num = sum(min(hv[k].get(ng, 0.0), rv[k][ng]) * rv[k][ng]
                          for ng in rv[k])
                if hn[k] and rn[k]:
                    s = num / (hn[k] * rn[k])
                else:
                    s = 0.0
                s *= math.exp(-(delta ** 2) / (2 * sigma ** 2))
                sim += s
            total += sim / n
        scores.append(10.0 * total / max(len(gts[key]), 1))
    return sum(scores) / max(len(scores), 1)
