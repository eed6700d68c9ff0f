"""
Taxonomy graph utilities: build a DAG of taxa (kingdom -> ... -> species),
walk ancestors/descendants, and map arbitrary dataset labels onto
canonical taxa.

Behavioral contract follows the reference
(megadetector/taxonomy_mapping/taxonomy_graph.py:346): TaxonNode objects
with parent/child links built from a taxonomy table; used by taxa-list
restriction and classification rollup. The reference's table comes from
GBIF/iNat dumps; here any iterable of rows works:
(taxon_id, level, name, parent_id).
"""

import json

from collections import defaultdict, deque


class TaxonNode:
    """One taxon: id, level (e.g. 'species'), name, parent/children."""

    def __init__(self, taxon_id, level, name, parent_id=None):
        self.taxon_id = taxon_id
        self.level = level
        self.name = name
        self.parent_id = parent_id
        self.parent = None
        self.children = []

    def __repr__(self):
        return 'TaxonNode({}, {}, {})'.format(
            self.taxon_id, self.level, self.name)


class TaxonomyGraph:
    """DAG over TaxonNode objects with name and id indices."""

    def __init__(self, rows=None):
        self.id_to_node = {}
        self.name_to_nodes = defaultdict(list)
        if rows is not None:
            for row in rows:
                self.add_node(*row)
            self.link()

    @classmethod
    def from_file(cls, path):
        """
        Load a taxonomy from disk: .json ([[id, level, name, parent_id],
        ...] or {'rows': [...]}) or .csv with columns
        id,level,name,parent_id (header optional).
        """

        import json as _json

        rows = []
        if str(path).endswith('.json'):
            with open(path) as f:
                data = _json.load(f)
            rows = data['rows'] if isinstance(data, dict) else data
        else:
            import csv
            with open(path, newline='') as f:
                for rec in csv.reader(f):
                    if not rec or rec[0].strip().lower() in ('id',
                                                             'taxon_id'):
                        continue
                    parent = rec[3].strip() if len(rec) > 3 and \
                        rec[3].strip() else None
                    rows.append((rec[0].strip(), rec[1].strip(),
                                 rec[2].strip(), parent))
        return cls(rows=rows)

    def add_node(self, taxon_id, level, name, parent_id=None):
        node = TaxonNode(taxon_id, level, str(name).lower(), parent_id)
        assert taxon_id not in self.id_to_node, \
            'Duplicate taxon id {}'.format(taxon_id)
        self.id_to_node[taxon_id] = node
        self.name_to_nodes[node.name].append(node)
        return node

    def link(self):
        """Resolve parent_id references into parent/children pointers."""

        for node in self.id_to_node.values():
            if node.parent_id is not None and \
                    node.parent_id in self.id_to_node:
                node.parent = self.id_to_node[node.parent_id]
                node.parent.children.append(node)

    def find(self, name):
        """Nodes whose name matches (case-insensitive)."""

        return self.name_to_nodes.get(str(name).lower(), [])

    def ancestors(self, node):
        """Ancestor chain, nearest first."""

        out = []
        cur = node.parent
        while cur is not None:
            out.append(cur)
            cur = cur.parent
        return out

    def descendants(self, node):
        """All descendants (BFS order)."""

        out = []
        queue = deque(node.children)
        while queue:
            cur = queue.popleft()
            out.append(cur)
            queue.extend(cur.children)
        return out

    def lowest_common_ancestor(self, node_a, node_b):
        """LCA of two nodes, or None."""

        seen = {id(node_a)}
        cur = node_a
        while cur.parent is not None:
            cur = cur.parent
            seen.add(id(cur))
        cur = node_b
        while cur is not None:
            if id(cur) in seen:
                return cur
            cur = cur.parent
        return None

    def map_to_allowed(self, name, allowed_names):
        """
        Map a taxon name to itself or its nearest ancestor within
        [allowed_names]; None when no ancestor qualifies.
        """

        allowed = set(str(a).lower() for a in allowed_names)
        name = str(name).lower()
        if name in allowed:
            return name
        for node in self.find(name):
            for ancestor in self.ancestors(node):
                if ancestor.name in allowed:
                    return ancestor.name
        return None

    def to_parent_chain_file(self, output_file):
        """
        Write {name: [ancestor names...]} JSON, the format consumed by
        classification_postprocessing.restrict_to_taxa_list.
        """

        chains = {}
        for node in self.id_to_node.values():
            chains[node.name] = [a.name for a in self.ancestors(node)]
        with open(output_file, 'w') as f:
            json.dump(chains, f, indent=1)
        return chains


def build_taxonomy_from_csv(csv_file, id_col='taxon_id', level_col='level',
                            name_col='name', parent_col='parent_id'):
    """Build a TaxonomyGraph from a CSV taxonomy table."""

    import csv
    rows = []
    with open(csv_file, newline='') as f:
        for row in csv.DictReader(f):
            parent = row.get(parent_col) or None
            rows.append((row[id_col], row.get(level_col, ''),
                         row[name_col], parent))
    return TaxonomyGraph(rows)
