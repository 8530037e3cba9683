"""Self-contained CLIP BPE tokenizer.

Behavioral spec: the reference's method/simple_tokenizer.py:1-132 (itself
the standard OpenAI CLIP tokenizer) with the in-repo
bpe_simple_vocab_16e6.txt.gz merge table (dldkd_tpu/tools/assets/). The
reference never imports its copy at runtime (its test.py delegates to the
external `clip` package, test.py:1); here it is the DEFAULT tokenizer for
tools/extract_teacher.py, with the HF tokenizer optional.

Vocabulary layout (the data contract with the merge file,
simple_tokenizer.py:62-75): 256 byte units, the same 256 suffixed with the
end-of-word marker '</w>', one entry per merge rule in file order, then
'<|startoftext|>' (49406) and '<|endoftext|>' (49407) — 49408 ids total.

Text cleaning: the reference runs ftfy.fix_text before html-unescaping
(simple_tokenizer.py:50-52). ftfy is not installed in this image; it is
used when importable and skipped otherwise (a no-op for well-formed text —
ftfy only rewrites mojibake).
"""

from __future__ import annotations

import functools
import gzip
import html
import os
from typing import Dict, List, Sequence, Tuple

import numpy as np
import regex

VOCAB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "assets", "bpe_simple_vocab_16e6.txt.gz")
SOT = "<|startoftext|>"
EOT = "<|endoftext|>"
# token splitter (simple_tokenizer.py:81): specials, contraction suffixes,
# letter runs, single digits, runs of other non-space symbols
_WORD_PAT = regex.compile(
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
    r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
    regex.IGNORECASE)
_N_MERGES = 49152 - 256 - 2  # merge rows consumed from the vocab file


@functools.lru_cache()
def byte_unicode_table() -> Dict[int, str]:
    """Reversible byte -> printable-unicode map (simple_tokenizer.py:16-36):
    printable latin bytes map to themselves; the rest are relocated above
    U+0100 so no BPE symbol is whitespace or a control character."""
    printable = (list(range(ord("!"), ord("~") + 1))
                 + list(range(ord("\xa1"), ord("\xac") + 1))
                 + list(range(ord("\xae"), ord("\xff") + 1)))
    table = {b: chr(b) for b in printable}
    hole = 0
    for b in range(256):
        if b not in table:
            table[b] = chr(256 + hole)
            hole += 1
    return table


def _clean(text: str) -> str:
    """basic_clean + whitespace_clean (simple_tokenizer.py:50-58)."""
    try:
        import ftfy
        text = ftfy.fix_text(text)
    except ImportError:
        pass
    text = html.unescape(html.unescape(text))
    return regex.sub(r"\s+", " ", text).strip()


class ClipTokenizer:
    """Byte-level BPE with end-of-word markers, CLIP vocabulary."""

    def __init__(self, vocab_path: str = VOCAB_PATH):
        self._byte_enc = byte_unicode_table()
        self._byte_dec = {c: b for b, c in self._byte_enc.items()}
        with gzip.open(vocab_path, "rt", encoding="utf-8") as f:
            rows = f.read().split("\n")[1:_N_MERGES + 1]
        merges: List[Tuple[str, str]] = [tuple(r.split()) for r in rows]
        self._rank = {pair: i for i, pair in enumerate(merges)}
        units = list(self._byte_enc.values())
        tokens = (units + [u + "</w>" for u in units]
                  + ["".join(p) for p in merges] + [SOT, EOT])
        self.encoder: Dict[str, int] = {t: i for i, t in enumerate(tokens)}
        self.decoder: Dict[int, str] = {i: t for t, i in self.encoder.items()}
        self.sot_id = self.encoder[SOT]
        self.eot_id = self.encoder[EOT]
        self._bpe_cache: Dict[str, List[str]] = {SOT: [SOT], EOT: [EOT]}

    # ------------------------------------------------------------- BPE core

    def _best_pair(self, word: List[str]):
        """Lowest-rank adjacent pair, or None when no pair is mergeable."""
        best, best_rank = None, len(self._rank)
        for pair in zip(word, word[1:]):
            r = self._rank.get(pair, -1)
            if 0 <= r < best_rank:
                best, best_rank = pair, r
        return best

    @staticmethod
    def _merge(word: List[str], first: str, second: str) -> List[str]:
        """Merge all non-overlapping (first, second) occurrences, left to
        right (the scan of simple_tokenizer.py:96-116)."""
        out, i = [], 0
        while i < len(word):
            if (i + 1 < len(word) and word[i] == first
                    and word[i + 1] == second):
                out.append(first + second)
                i += 2
            else:
                out.append(word[i])
                i += 1
        return out

    def _bpe(self, token: str) -> List[str]:
        """Split one pre-tokenized word (unicode-mapped bytes) into BPE
        symbols; the final byte carries the '</w>' marker."""
        cached = self._bpe_cache.get(token)
        if cached is not None:
            return cached
        word = list(token[:-1]) + [token[-1] + "</w>"] if token else []
        while len(word) > 1:
            pair = self._best_pair(word)
            if pair is None:
                break
            word = self._merge(word, *pair)
        self._bpe_cache[token] = word
        return word

    # ------------------------------------------------------------- public

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for tok in _WORD_PAT.findall(_clean(text).lower()):
            mapped = "".join(self._byte_enc[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[sym] for sym in self._bpe(mapped))
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        text = "".join(self.decoder[i] for i in ids)
        raw = bytes(self._byte_dec[c] for c in text
                    if c in self._byte_dec)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")

    def tokenize(self, texts: Sequence[str], context_length: int = 77
                 ) -> Dict[str, np.ndarray]:
        """Batch to fixed-length model inputs: <sot> ids <eot>, truncated
        to context_length (eot always kept, as HF truncation does), padded
        with eot. Returns {input_ids, attention_mask} — the contract of
        extract_teacher's tokenize_fn. CLIP's text pooling reads the
        argmax-id position, which stays the FIRST eot under eot-padding."""
        n = len(texts)
        input_ids = np.full((n, context_length), self.eot_id, np.int32)
        mask = np.zeros((n, context_length), np.int32)
        for r, text in enumerate(texts):
            ids = [self.sot_id] + self.encode(text)
            ids = ids[:context_length - 1] + [self.eot_id]
            input_ids[r, :len(ids)] = ids
            mask[r, :len(ids)] = 1
        return {"input_ids": input_ids, "attention_mask": mask}
