"""
CLI: download a species-filtered subset of a LILA dataset (reference:
megadetector/data_management/lila/download_lila_subset.py; the logic
lives in lila_common).
"""

import argparse
import sys

from megadetector_tpu.data_management.lila.lila_common import (
    download_lila_subset, get_lila_dataset_index,
    read_metadata_file_for_dataset, select_lila_images_by_species)


def main():
    parser = argparse.ArgumentParser(
        description='Download all images of given species from a LILA '
                    'dataset')
    parser.add_argument('dataset_name')
    parser.add_argument('output_folder')
    parser.add_argument('--species', nargs='+', required=True)
    parser.add_argument('--metadata_dir', default=None)
    parser.add_argument('--n_workers', type=int, default=8)
    parser.add_argument('--max_images', type=int, default=None)
    if len(sys.argv[1:]) == 0:
        parser.print_help()
        parser.exit()
    args = parser.parse_args()

    index = get_lila_dataset_index(metadata_dir=args.metadata_dir)
    assert args.dataset_name in index, \
        'Unknown dataset {} (available: {})'.format(
            args.dataset_name, ', '.join(sorted(index)))
    entry = index[args.dataset_name]
    cct = read_metadata_file_for_dataset(entry, args.metadata_dir)
    image_files = select_lila_images_by_species(cct, args.species)
    if args.max_images is not None:
        image_files = image_files[:args.max_images]
    print('Downloading {} images'.format(len(image_files)))
    download_lila_subset(entry, image_files, args.output_folder,
                         n_workers=args.n_workers)


if __name__ == '__main__':
    main()
