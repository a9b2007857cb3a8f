"""CoNLL-2002 BIO file source.

Capability parity with the reference's ``load_conll2002_bio``
(``renard/ner_utils.py:183-231``): parse ``token<sep>tag`` lines with
blank-line sentence boundaries into (sentences, tokens, entities); plus
a Ray Data reader that yields one row per document/sentence-block for
distributed NER evaluation or fine-tuning-data prep.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

import ray
from ray.data import Dataset

from renard_ray.textproc.ner import Entity, bio_to_entities


@dataclass
class ConllDoc:
    sentences: list[list[str]]
    tokens: list[str]
    tags: list[str]
    entities: list[Entity]


def parse_conll2002_bio(text: str, separator: str = " ") -> ConllDoc:
    """Parse one CoNLL-2002 BIO document."""
    sentences: list[list[str]] = []
    tokens: list[str] = []
    tags: list[str] = []
    cur: list[str] = []
    for line in text.splitlines():
        line = line.rstrip("\n")
        if not line.strip():
            if cur:
                sentences.append(cur)
                cur = []
            continue
        parts = line.split(separator)
        tok, tag = parts[0], parts[-1]
        cur.append(tok)
        tokens.append(tok)
        tags.append(tag)
    if cur:
        sentences.append(cur)
    return ConllDoc(sentences, tokens, tags, bio_to_entities(tags))


def read_conll2002_bio(path: str, separator: str = " ") -> Dataset:
    """Ray Data source: one row per sentence with tokens/tags/entity
    spans (columnar; downstream NER stages consume it directly)."""
    # read_text drops the blank lines that mark sentence boundaries, so
    # read whole files (CoNLL fixtures are small side inputs) and parse
    # PER FILE (a packed block can hold several files; concatenating
    # them would merge a trailing sentence with the next file's first
    # and restart sent_id per block).  ``include_paths`` gives each row
    # its file, which becomes the per-file id column.
    files = ray.data.read_binary_files(path, include_paths=True)

    def assemble(batch: pa.Table) -> pa.Table:
        paths_out, sids, sent_toks, sent_tags, ents = [], [], [], [], []
        for p, b in zip(
            batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
        ):
            doc = parse_conll2002_bio(b.decode("utf-8"), separator)
            i = 0
            for sid, sent in enumerate(doc.sentences):
                tags = doc.tags[i : i + len(sent)]
                spans = [
                    {"start": e.start, "end": e.end, "tag": e.tag}
                    for e in bio_to_entities(tags)
                ]
                paths_out.append(p)
                sids.append(sid)
                sent_toks.append(sent)
                sent_tags.append(tags)
                ents.append(spans)
                i += len(sent)
        return pa.table(
            {
                "path": pa.array(paths_out, pa.string()),
                "sent_id": pa.array(sids, pa.int64()),
                "tokens": pa.array(sent_toks, pa.list_(pa.string())),
                "tags": pa.array(sent_tags, pa.list_(pa.string())),
                "entities": pa.array(
                    ents,
                    pa.list_(
                        pa.struct(
                            [("start", pa.int64()), ("end", pa.int64()), ("tag", pa.string())]
                        )
                    ),
                ),
            }
        )

    return files.map_batches(assemble, batch_format="pyarrow", batch_size=None)
