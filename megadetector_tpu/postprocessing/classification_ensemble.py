"""
Classifier-output ensembling: taxonomy rollup and geofencing.

Plays the role of the SpeciesNet ensemble stage the reference invokes
(megadetector/detection/run_md_and_speciesnet.py:51-55,1067): after the
raw classifier forward, (a) geofencing zeroes out species that cannot
occur at the capture location, and (b) taxonomic rollup walks predictions
up the taxonomy until the accumulated confidence clears a threshold, so
an uncertain 'red fox vs gray fox' becomes a confident 'canidae'.

Both operate on MD results with 'classifications' arrays plus a
TaxonomyGraph (taxonomy_mapping/taxonomy_graph.py) and a geofence table
({species name: [allowed location prefixes]}).
"""

import json

from collections import defaultdict

from megadetector_tpu.utils import ct_utils


class EnsembleOptions:
    """Options controlling apply_classification_ensemble()."""

    def __init__(self):
        # Roll predictions up the taxonomy until the accumulated
        # confidence at a node clears this threshold
        self.rollup_confidence_threshold = 0.65
        # Don't roll up beyond this taxonomic level (inclusive)
        self.max_rollup_level = 'class'
        # {species name: [allowed location prefixes]}; species absent
        # from the table are allowed everywhere
        self.geofence_table = None
        # Callable mapping an image dict -> location string (default:
        # the 'location' field, else the folder)
        self.location_for_image = None
        self.top_k = 3


def _default_location(im):
    if 'location' in im:
        return str(im['location'])
    import os
    return os.path.dirname(im['file'])


def geofence_classifications(scores_by_name, location, geofence_table):
    """
    Zero out species not allowed at [location] and renormalize.
    [geofence_table] maps species name -> list of allowed location
    prefixes. Returns a new {name: score}.
    """

    if not geofence_table:
        return dict(scores_by_name)

    out = {}
    for name, score in scores_by_name.items():
        allowed = geofence_table.get(name)
        if allowed is not None and location is not None:
            if not any(str(location).startswith(str(p))
                       for p in allowed):
                score = 0.0
        out[name] = score

    total = sum(out.values())
    if total > 0:
        out = {k: v / total for k, v in out.items()}
    return out


def rollup_classifications(scores_by_name, taxonomy, threshold,
                           max_level='class'):
    """
    Walk scores up the taxonomy: if the top species is below [threshold],
    accumulate sibling scores at each ancestor until some node clears it.
    Returns (name, confidence) of the chosen prediction.
    """

    if not scores_by_name:
        return None

    top_name = max(scores_by_name, key=scores_by_name.get)
    top_score = scores_by_name[top_name]
    if top_score >= threshold or taxonomy is None:
        return top_name, top_score

    # Accumulate each prediction's score onto all of its ancestors
    node_scores = defaultdict(float)
    for name, score in scores_by_name.items():
        nodes = taxonomy.find(name)
        if not nodes:
            continue
        node = nodes[0]
        node_scores[node.name] += score
        for ancestor in taxonomy.ancestors(node):
            node_scores[ancestor.name] += score

    # Choose the most specific node clearing the threshold along the top
    # prediction's ancestor chain
    top_nodes = taxonomy.find(top_name)
    if not top_nodes:
        return top_name, top_score
    chain = [top_nodes[0]] + taxonomy.ancestors(top_nodes[0])
    for node in chain:
        score = node_scores.get(node.name, 0.0)
        if score >= threshold:
            return node.name, min(score, 1.0)
        if node.level == max_level:
            break
    return top_name, top_score


def apply_classification_ensemble(input_file, taxonomy=None,
                                  output_file=None, options=None):
    """
    Apply geofencing + rollup to every classified detection in an MD
    results file (path or dict). New category IDs are allocated for
    rolled-up taxa. Returns the (modified) dict.
    """

    if options is None:
        options = EnsembleOptions()
    location_fn = options.location_for_image or _default_location

    if isinstance(input_file, str):
        with open(input_file) as f:
            data = json.load(f)
    else:
        data = input_file

    categories = data.get('classification_categories', {})
    name_to_id = {str(v).lower(): k for k, v in categories.items()}

    def id_for_name(name):
        name = str(name).lower()
        if name not in name_to_id:
            new_id = str(max([int(k) for k in categories] + [-1]) + 1)
            categories[new_id] = name
            name_to_id[name] = new_id
        return name_to_id[name]

    n_geofenced = 0
    n_rolled_up = 0

    for im in data['images']:
        location = location_fn(im)
        for det in im.get('detections') or []:
            classifications = det.get('classifications')
            if not classifications:
                continue
            scores = {str(categories.get(c[0], c[0])).lower(): c[1]
                      for c in classifications}

            if options.geofence_table:
                new_scores = geofence_classifications(
                    scores, location, options.geofence_table)
                if new_scores != scores:
                    n_geofenced += 1
                scores = new_scores

            result = rollup_classifications(
                scores, taxonomy, options.rollup_confidence_threshold,
                options.max_rollup_level)
            if result is None:
                det['classifications'] = []
                continue
            name, conf = result
            if name not in scores or scores.get(name, 0) != conf:
                n_rolled_up += 1

            ranked = sorted(scores.items(), key=lambda kv: -kv[1])
            out = [[id_for_name(name), round(float(conf), 4)]]
            for other_name, other_score in ranked:
                if other_name == name or other_score <= 0:
                    continue
                out.append([id_for_name(other_name),
                            round(float(other_score), 4)])
                if len(out) >= options.top_k:
                    break
            det['classifications'] = out

    data['classification_categories'] = categories
    print('Ensemble: geofenced {} detections, rolled up {}'.format(
        n_geofenced, n_rolled_up))

    if output_file is not None:
        ct_utils.write_json(output_file, data, force_str=True)
    return data
