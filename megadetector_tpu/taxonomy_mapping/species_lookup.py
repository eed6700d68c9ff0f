"""
Species name lookup: map free-form dataset labels (common or scientific
names) to canonical taxa.

Behavioral contract follows the reference
(megadetector/taxonomy_mapping/species_lookup.py): the reference queries
downloaded GBIF/iNat taxonomy dumps; here lookups run against any local
taxonomy table loaded into a TaxonomyGraph plus a common-name synonym
map, so the pipeline works offline. Matching: exact name, synonym,
then fuzzy (token-overlap) fallback.
"""

import json
import re

from megadetector_tpu.taxonomy_mapping.taxonomy_graph import TaxonomyGraph


def _normalize(s):
    s = str(s).strip().lower()
    s = re.sub(r'[_\-]+', ' ', s)
    s = re.sub(r'\s+', ' ', s)
    return s


class SpeciesLookup:
    """
    Name resolver over a TaxonomyGraph + synonym table.

    Args:
        taxonomy: TaxonomyGraph, or rows for one
        synonyms: {alias: canonical name} (e.g. common -> scientific)
    """

    def __init__(self, taxonomy=None, synonyms=None):
        if taxonomy is None:
            taxonomy = TaxonomyGraph()
        elif not isinstance(taxonomy, TaxonomyGraph):
            taxonomy = TaxonomyGraph(taxonomy)
        self.taxonomy = taxonomy
        self.synonyms = {_normalize(k): _normalize(v)
                         for k, v in (synonyms or {}).items()}

    @classmethod
    def from_files(cls, taxonomy_csv=None, synonyms_json=None):
        from megadetector_tpu.taxonomy_mapping.taxonomy_graph import \
            build_taxonomy_from_csv
        taxonomy = build_taxonomy_from_csv(taxonomy_csv) \
            if taxonomy_csv else None
        synonyms = None
        if synonyms_json:
            with open(synonyms_json) as f:
                synonyms = json.load(f)
        return cls(taxonomy, synonyms)

    def lookup(self, query):
        """
        Resolve [query] to a TaxonNode (or None). Tries exact match,
        synonym match, then token-overlap fuzzy match.
        """

        q = _normalize(query)

        nodes = self.taxonomy.find(q)
        if nodes:
            return nodes[0]

        if q in self.synonyms:
            nodes = self.taxonomy.find(self.synonyms[q])
            if nodes:
                return nodes[0]

        # Fuzzy: the query's tokens are a subset of a taxon's tokens or
        # vice versa ('white-tailed deer' ~ 'white tailed deer')
        q_tokens = set(q.split())
        best = None
        best_overlap = 0
        for name, nodes in self.taxonomy.name_to_nodes.items():
            n_tokens = set(name.split())
            if not n_tokens:
                continue
            overlap = len(q_tokens & n_tokens)
            if overlap == 0:
                continue
            if q_tokens <= n_tokens or n_tokens <= q_tokens:
                if overlap > best_overlap:
                    best_overlap = overlap
                    best = nodes[0]
        return best

    def lookup_name(self, query):
        """Resolved canonical name, or None."""

        node = self.lookup(query)
        return node.name if node is not None else None

    def map_labels(self, labels):
        """{input label: canonical name or None} for a list of labels."""

        return {label: self.lookup_name(label) for label in labels}
