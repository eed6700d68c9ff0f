"""
Map a trained classifier's output categories onto a desired target
category set.

Reference contract (megadetector/classification/
map_classification_categories.py:1-60): given two label-spec JSONs (the
desired targets and the spec the classifier was trained with), each
classifier category maps to the target whose matched label set contains
it as a subset; any partial intersection is an error; unassigned
classifier categories group into "other" (the desired spec must not
define a target named "other"). Outputs {target: [classifier
categories]} — the input format of aggregate_classifier_probs.

Membership is resolved through the same spec semantics as
json_validator.parse_spec: (dataset, dataset_label) inclusion pairs,
with taxa expanded against the provided taxonomy.
"""

import argparse
import json
import sys

from megadetector_tpu.classification.json_validator import parse_spec


def map_classification_categories(desired_spec, classifier_spec,
                                  taxonomy=None):
    """
    Returns {target_name: [classifier category names]} incl. 'other'.
    Raises ValueError on partial overlap.
    """

    assert 'other' not in desired_spec, \
        'the desired spec must not define a target named "other"'

    target_pairs = {t: parse_spec(t, s, taxonomy)
                    for t, s in desired_spec.items()}
    category_pairs = {c: parse_spec(c, s, taxonomy)
                      for c, s in classifier_spec.items()}

    mapping = {t: [] for t in desired_spec}
    other = []
    for category, c_pairs in category_pairs.items():
        assigned = None
        for target, t_pairs in target_pairs.items():
            inter = c_pairs & t_pairs
            if not inter:
                continue
            if c_pairs <= t_pairs:
                if assigned is not None:
                    raise ValueError(
                        'classifier category {} is a subset of both '
                        '{} and {}'.format(category, assigned, target))
                assigned = target
            else:
                raise ValueError(
                    'classifier category {} partially intersects '
                    'target {}: {}'.format(category, target,
                                           sorted(inter)[:5]))
        if assigned is not None:
            mapping[assigned].append(category)
        else:
            other.append(category)

    mapping = {t: sorted(cats) for t, cats in mapping.items()}
    if other:
        mapping['other'] = sorted(other)
    return mapping


def main():
    parser = argparse.ArgumentParser(
        description='Map classifier categories onto target categories')
    parser.add_argument('desired_spec_json')
    parser.add_argument('classifier_spec_json')
    parser.add_argument('output_json')
    parser.add_argument('--taxonomy_csv', default=None)

    if len(sys.argv[1:]) == 0:
        parser.print_help()
        parser.exit()

    args = parser.parse_args()
    with open(args.desired_spec_json) as f:
        desired = json.load(f)
    with open(args.classifier_spec_json) as f:
        classifier = json.load(f)
    taxonomy = None
    if args.taxonomy_csv is not None:
        from megadetector_tpu.taxonomy_mapping.taxonomy_graph import \
            build_taxonomy_from_csv
        taxonomy = build_taxonomy_from_csv(args.taxonomy_csv)
    mapping = map_classification_categories(desired, classifier,
                                            taxonomy)
    with open(args.output_json, 'w') as f:
        json.dump(mapping, f, indent=1)
    print('Wrote mapping for {} targets to {}'.format(
        len(mapping), args.output_json))


if __name__ == '__main__':
    main()
