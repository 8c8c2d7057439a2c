"""UniProt domain annotation lookup.

The reference ships a stub (`get_domains` returning None,
src/python/kmerseek/uniprot.py:6-19) wired into a dead `show_results`
path (search.py:21-34), with an XML fixture committed for future use.
This build goes one step further: when a UniProt XML export is
available locally, domain/region features overlapping a hit interval
are actually returned; with no XML (the zero-egress default) the
behavior degrades to the reference's stub contract (None).
"""

from __future__ import annotations

import gzip
import os
import xml.etree.ElementTree as ET
from dataclasses import dataclass
from typing import List, Optional

_NS = "{http://uniprot.org/uniprot}"


@dataclass
class Domain:
    name: str
    start: int  # 0-based inclusive
    end: int  # 0-based exclusive


_FEATURE_TYPES = {"domain", "region of interest", "zinc finger region", "motif"}


import functools


@functools.lru_cache(maxsize=4)
def _load_uniprot_xml_cached(path: str):
    return load_uniprot_xml(path)


def load_uniprot_xml(path: str):
    """Parse a UniProt XML export → {accession: [Domain]}."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        tree = ET.parse(f)
    out = {}
    for entry in tree.getroot().iter(f"{_NS}entry"):
        accs = [a.text for a in entry.findall(f"{_NS}accession")]
        domains: List[Domain] = []
        for feat in entry.findall(f"{_NS}feature"):
            if feat.get("type") not in _FEATURE_TYPES:
                continue
            loc = feat.find(f"{_NS}location")
            if loc is None:
                continue
            begin = loc.find(f"{_NS}begin")
            end = loc.find(f"{_NS}end")
            if begin is None or end is None:
                continue
            b, e = begin.get("position"), end.get("position")
            if b is None or e is None:
                continue
            domains.append(
                Domain(feat.get("description") or feat.get("type"), int(b) - 1, int(e))
            )
        for acc in accs:
            out[acc] = domains
    return out


def get_domains(
    uniprot_id: str,
    start: int,
    end: int,
    xml_path: Optional[str] = None,
) -> Optional[List[Domain]]:
    """Domains of ``uniprot_id`` overlapping [start, end).

    Returns None when no local XML source is available — the
    reference's stub behavior (uniprot.py:6-19)."""
    if xml_path is None or not os.path.exists(xml_path):
        return None
    table = _load_uniprot_xml_cached(xml_path)
    acc = uniprot_id.split("|")[1] if "|" in uniprot_id else uniprot_id
    domains = table.get(acc)
    if domains is None:
        return None
    return [d for d in domains if d.start < end and d.end > start]
