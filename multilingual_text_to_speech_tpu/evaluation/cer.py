"""Character error rate against ASR transcripts, with 95% CIs.

Rebuild of ``/root/reference/evaluation/cer_computer.py``: full Levenshtein
with per-operation counts, CER = (S+I+D)/len(ref), cleaning, and a
t-distribution confidence interval.  For Chinese/Japanese the romanized
(pinyin/romaji) field of the eval metafile is scored instead of the raw text
(cer_computer.py:96-99).

Usage:
    python -m multilingual_text_to_speech_tpu.evaluation.cer \
        --language german --model generated --where eval_data
"""

from __future__ import annotations

import ast
import json
import os
import re
from typing import List, Tuple

import numpy as np
import scipy.stats

PUNCTUATIONS_OUT = '—「」、。，"(),.:;¿？：！《》“”?⑸¡!\\'
PUNCTUATIONS_IN = "'-"


def levenshtein(u: str, v: str) -> Tuple[int, Tuple[int, int, int]]:
    """Edit distance with (substitutions, deletions, insertions) counts
    (reference: cer_computer.py:21-43)."""
    prev = None
    curr = [0] + list(range(1, len(v) + 1))
    prev_ops = None
    curr_ops: List = [(0, 0, i) for i in range(len(v) + 1)]
    for x in range(1, len(u) + 1):
        prev, curr = curr, [x] + [None] * len(v)
        prev_ops, curr_ops = curr_ops, [(0, x, 0)] + [None] * len(v)
        for y in range(1, len(v) + 1):
            delcost = prev[y] + 1
            addcost = curr[y - 1] + 1
            subcost = prev[y - 1] + int(u[x - 1] != v[y - 1])
            curr[y] = min(subcost, delcost, addcost)
            if curr[y] == subcost:
                n_s, n_d, n_i = prev_ops[y - 1]
                curr_ops[y] = (n_s + int(u[x - 1] != v[y - 1]), n_d, n_i)
            elif curr[y] == delcost:
                n_s, n_d, n_i = prev_ops[y]
                curr_ops[y] = (n_s, n_d + 1, n_i)
            else:
                n_s, n_d, n_i = curr_ops[y - 1]
                curr_ops[y] = (n_s, n_d, n_i + 1)
    return curr[len(v)], curr_ops[len(v)]


def sample_cer(reference: str, hypothesis: str) -> float:
    """(S + I + D) / len(reference) (reference: cer_computer.py:46-48)."""
    _, (s, d, i) = levenshtein(reference, hypothesis)
    return (s + i + d) / len(reference)


def clean(text: str, case_sensitive: bool, punctuation: bool) -> str:
    """Normalization before scoring (reference: cer_computer.py:51-65)."""
    if not case_sensitive:
        text = text.lower()
    if not punctuation:
        pattern = "[" + re.escape(PUNCTUATIONS_OUT + PUNCTUATIONS_IN) + "]"
        text = re.sub(pattern, "", text)
    return " ".join(text.split())


def confidence_interval(data, confidence: float = 0.95) -> Tuple[float, float]:
    """t-distribution CI (reference: cer_computer.py:68-73)."""
    a = 1.0 * np.asarray(data)
    n = len(a)
    m, se = np.mean(a), scipy.stats.sem(a)
    h = se * scipy.stats.t.ppf((1 + confidence) / 2.0, n - 1)
    return m - h, m + h


def read_asr_transcript(path: str):
    """Read an ASR result file (JSON list of results with alternatives)."""
    with open(path, "r", encoding="utf-8") as f:
        content = f.read()
    try:
        return json.loads(content)
    except json.JSONDecodeError:
        # reference writes python-repr dicts (asr_request.py)
        return ast.literal_eval(content)


def evaluate_language(language: str, model: str, where: str,
                      case_sensitive: bool = False,
                      punctuation: bool = False) -> List[Tuple[str, float]]:
    """Score one language's ASR outputs against the eval metafile
    (reference: cer_computer.py:88-121)."""
    cers: List[Tuple[str, float]] = []
    meta_file = os.path.join(where, "all_meta_files", f"{language}.txt")
    with open(meta_file, "r", encoding="utf-8") as f:
        for line in f:
            tokens = line.rstrip().split("|")
            idx = tokens[0]
            truth = tokens[2] if language in ("japanese", "chinese") else tokens[1]

            asr_path = os.path.join(where, model, "asr", language, f"{idx}.json")
            if not os.path.exists(asr_path):
                print(f"Missing ASR results of {idx}!")
                continue
            asr = read_asr_transcript(asr_path)
            transcript = asr[0]["alternatives"][0]["transcript"]

            cer = sample_cer(
                clean(truth, case_sensitive, punctuation),
                clean(transcript, case_sensitive, punctuation),
            )
            if len(asr) > 1:
                joined = "".join(
                    h["alternatives"][0]["transcript"] for h in asr
                )
                cer = min(cer, sample_cer(
                    clean(truth, case_sensitive, punctuation),
                    clean(joined, case_sensitive, punctuation),
                ))
            cers.append((idx, cer))
    return cers


def write_report(cers, output_file: str, metric: str = "CER") -> None:
    values = [c for _, c in cers]
    lower, upper = confidence_interval(values)
    os.makedirs(os.path.dirname(output_file), exist_ok=True)
    with open(output_file, "w", encoding="utf-8") as f:
        print(f"Total mean {metric}: {np.mean(values)}", file=f)
        print(f"Std. dev. of {metric}: {np.std(values)}", file=f)
        print(f"Conf. interval: ({lower}, {upper})", file=f)
        for idx, c in cers:
            print(f"{idx}|{c}", file=f)


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--language", type=str, required=True)
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--where", type=str, required=True)
    parser.add_argument("--case_sensitive", action="store_true")
    parser.add_argument("--punctuation", action="store_true")
    args = parser.parse_args(argv)

    cers = evaluate_language(
        args.language, args.model, args.where,
        args.case_sensitive, args.punctuation,
    )
    out = os.path.join(args.where, args.model, "cer", f"{args.language}.txt")
    write_report(cers, out, "CER")
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
