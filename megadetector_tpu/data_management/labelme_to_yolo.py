"""
Convert labelme annotations to YOLO label files.

Behavioral contract follows the reference
(megadetector/data_management/labelme_to_yolo.py): one .txt next to each
image with normalized center-format rows; the class list is collected
from shape labels (or provided).
"""

import argparse
import json
import os
import sys

from megadetector_tpu.utils.path_utils import find_images, \
    recursive_file_list


def labelme_to_yolo(input_folder, class_list=None,
                    class_file_name='classes.txt',
                    recursive=True, overwrite=True):
    """
    Write YOLO .txt labels next to the images in [input_folder]. Returns
    the (possibly extended) class list.
    """

    if class_list is None:
        class_list = []
    class_to_idx = {name: i for i, name in enumerate(class_list)}

    labelme_files = [fn for fn in recursive_file_list(
        input_folder, return_relative_paths=False, recursive=recursive)
        if fn.endswith('.json')]

    for labelme_path in labelme_files:
        try:
            with open(labelme_path) as f:
                labelme = json.load(f)
        except Exception:
            continue
        if 'shapes' not in labelme:
            continue
        w = labelme.get('imageWidth')
        h = labelme.get('imageHeight')
        if not w or not h:
            continue

        rows = []
        for shape in labelme['shapes']:
            if shape.get('shape_type') != 'rectangle':
                continue
            label = shape['label']
            if label not in class_to_idx:
                class_to_idx[label] = len(class_list)
                class_list.append(label)
            xs = [p[0] for p in shape['points']]
            ys = [p[1] for p in shape['points']]
            x0, x1 = min(xs), max(xs)
            y0, y1 = min(ys), max(ys)
            rows.append('{} {:.6f} {:.6f} {:.6f} {:.6f}'.format(
                class_to_idx[label],
                (x0 + x1) / 2 / w, (y0 + y1) / 2 / h,
                (x1 - x0) / w, (y1 - y0) / h))

        txt_path = os.path.splitext(labelme_path)[0] + '.txt'
        if os.path.isfile(txt_path) and not overwrite:
            continue
        with open(txt_path, 'w') as f:
            f.write('\n'.join(rows) + ('\n' if rows else ''))

    with open(os.path.join(input_folder, class_file_name), 'w') as f:
        for name in class_list:
            f.write(name + '\n')
    return class_list


def main():
    parser = argparse.ArgumentParser(
        description='Convert labelme annotations to YOLO labels')
    parser.add_argument('input_folder')
    if len(sys.argv[1:]) == 0:
        parser.print_help()
        parser.exit()
    args = parser.parse_args()
    labelme_to_yolo(args.input_folder)


if __name__ == '__main__':
    main()
