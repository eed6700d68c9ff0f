"""
Convert a COCO(-CT) database to per-image labelme .json files.

Behavioral contract follows the reference
(megadetector/data_management/coco_to_labelme.py): one labelme file next
to each image, rectangle shapes from COCO absolute boxes.
"""

import argparse
import json
import os
import sys

from tqdm import tqdm

from megadetector_tpu.utils import ct_utils


def coco_to_labelme(coco_file, image_folder, overwrite=False,
                    verbose=False):
    """
    Write labelme .json files next to the images named in [coco_file].
    Returns the list of files written.
    """

    if isinstance(coco_file, str):
        with open(coco_file) as f:
            coco = json.load(f)
    else:
        coco = coco_file

    cat_id_to_name = {c['id']: c['name']
                      for c in coco.get('categories', [])}
    image_id_to_anns = {}
    for ann in coco.get('annotations', []):
        image_id_to_anns.setdefault(ann['image_id'], []).append(ann)

    files_written = []
    for im in tqdm(coco['images'], desc='Writing labelme files'):
        fn = im['file_name']
        width = im.get('width')
        height = im.get('height')
        if width is None or height is None:
            try:
                from PIL import Image
                with Image.open(os.path.join(image_folder, fn)) as pil_im:
                    width, height = pil_im.size
            except Exception:
                continue

        shapes = []
        for ann in image_id_to_anns.get(im['id'], []):
            bbox = ann.get('bbox')
            if bbox is None:
                continue
            x, y, w, h = bbox
            shapes.append({
                'label': cat_id_to_name.get(ann['category_id'],
                                            str(ann['category_id'])),
                'points': [[x, y], [x + w, y + h]],
                'group_id': None,
                'shape_type': 'rectangle',
                'flags': {},
            })

        labelme = {'version': '5.3.0', 'flags': {}, 'shapes': shapes,
                   'imagePath': os.path.basename(fn),
                   'imageData': None,
                   'imageHeight': height, 'imageWidth': width}
        labelme_path = os.path.join(
            image_folder, os.path.splitext(fn)[0] + '.json')
        if os.path.isfile(labelme_path) and not overwrite:
            continue
        ct_utils.write_json(labelme_path, labelme)
        files_written.append(labelme_path)

    return files_written


def main():
    parser = argparse.ArgumentParser(
        description='Convert a COCO database to labelme files')
    parser.add_argument('coco_file')
    parser.add_argument('image_folder')
    parser.add_argument('--overwrite', action='store_true')

    if len(sys.argv[1:]) == 0:
        parser.print_help()
        parser.exit()

    args = parser.parse_args()
    coco_to_labelme(args.coco_file, args.image_folder,
                    overwrite=args.overwrite)


if __name__ == '__main__':
    main()
