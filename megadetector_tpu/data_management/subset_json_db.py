"""
Subset a COCO Camera Traps database by filename query or explicit list.

Behavioral contract follows the reference
(megadetector/data_management/subset_json_db.py): images matching the
query (or list) are kept along with their annotations; categories are
kept as-is.
"""

import argparse
import json
import sys

from megadetector_tpu.utils import ct_utils


def subset_json_db(input_json, query, output_json=None, ignore_case=False):
    """
    Subset a CCT database.

    Args:
        input_json: CCT .json filename or loaded dict
        query: substring to match in file_name, a list of substrings (any
            match keeps the image), or a list file of exact relative paths
        output_json: optional output path
        ignore_case: case-insensitive matching

    Returns:
        the subset dict
    """

    if isinstance(input_json, str):
        with open(input_json) as f:
            data = json.load(f)
    else:
        data = input_json

    if isinstance(query, str) and query.endswith('.json'):
        with open(query) as f:
            filenames = set(json.load(f))
        def matches(fn): # noqa
            return fn in filenames
    else:
        queries = [query] if isinstance(query, str) else list(query)
        if ignore_case:
            queries = [q.lower() for q in queries]

        def matches(fn):
            s = fn.lower() if ignore_case else fn
            return any(q in s for q in queries)

    images = [im for im in data['images'] if matches(im['file_name'])]
    image_ids = set(im['id'] for im in images)
    annotations = [ann for ann in data.get('annotations', [])
                   if ann['image_id'] in image_ids]

    subset = {k: v for k, v in data.items()
              if k not in ('images', 'annotations')}
    subset['images'] = images
    subset['annotations'] = annotations

    if output_json is not None:
        ct_utils.write_json(output_json, subset, force_str=True)
    return subset


def main():
    parser = argparse.ArgumentParser(
        description='Subset a COCO Camera Traps database')
    parser.add_argument('input_json')
    parser.add_argument('output_json')
    parser.add_argument('query')
    parser.add_argument('--ignore_case', action='store_true')

    if len(sys.argv[1:]) == 0:
        parser.print_help()
        parser.exit()

    args = parser.parse_args()
    subset_json_db(args.input_json, args.query, args.output_json,
                   ignore_case=args.ignore_case)


if __name__ == '__main__':
    main()
