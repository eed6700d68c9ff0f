"""
digiKam / XMP integration: write MD detection categories into image XMP
sidecar metadata (hierarchical subject tags) so photo managers can filter
by them.

Behavioral contract follows the reference
(megadetector/api/batch_processing/integration/digiKam/
xmp_integration.py:465): per-image tags like 'MegaDetector|animal' above
a confidence threshold, written to .xmp sidecar files (never modifying
the original images).
"""

import argparse
import json
import os
import sys

from tqdm import tqdm

XMP_TEMPLATE = '''<?xpacket begin="﻿" id="W5M0MpCehiHzreSzNTczkc9d"?>
<x:xmpmeta xmlns:x="adobe:ns:meta/">
 <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
  <rdf:Description rdf:about=""
    xmlns:dc="http://purl.org/dc/elements/1.1/"
    xmlns:lr="http://ns.adobe.com/lightroom/1.0/">
   <dc:subject>
    <rdf:Bag>
{subjects}
    </rdf:Bag>
   </dc:subject>
   <lr:hierarchicalSubject>
    <rdf:Bag>
{hierarchical}
    </rdf:Bag>
   </lr:hierarchicalSubject>
  </rdf:Description>
 </rdf:RDF>
</x:xmpmeta>
<?xpacket end="w"?>
'''


def _tags_for_image(im, detection_categories, classification_categories,
                    confidence_threshold, classification_threshold,
                    tag_prefix='MegaDetector'):
    tags = set()
    for det in im.get('detections') or []:
        if det['conf'] < confidence_threshold:
            continue
        name = detection_categories.get(det['category'], det['category'])
        tags.add('{}|{}'.format(tag_prefix, name))
        for c in det.get('classifications') or []:
            if c[1] >= classification_threshold:
                class_name = classification_categories.get(c[0], c[0])
                tags.add('{}|{}|{}'.format(tag_prefix, name, class_name))
    if not tags and im.get('detections') is not None:
        tags.add('{}|empty'.format(tag_prefix))
    return sorted(tags)


def write_xmp_sidecar(image_path, tags):
    """Write (overwrite) an .xmp sidecar next to [image_path]."""

    subjects = '\n'.join(
        '     <rdf:li>{}</rdf:li>'.format(t.split('|')[-1])
        for t in tags)
    hierarchical = '\n'.join(
        '     <rdf:li>{}</rdf:li>'.format(t) for t in tags)
    xmp_path = os.path.splitext(image_path)[0] + '.xmp'
    with open(xmp_path, 'w', encoding='utf-8') as f:
        f.write(XMP_TEMPLATE.format(subjects=subjects,
                                    hierarchical=hierarchical))
    return xmp_path


def write_results_to_xmp(results_file, image_folder,
                         confidence_threshold=0.2,
                         classification_threshold=0.5,
                         tag_prefix='MegaDetector'):
    """
    Write XMP sidecars for every image in an MD results file. Returns the
    list of sidecar paths written.
    """

    with open(results_file) as f:
        data = json.load(f)

    detection_categories = data.get('detection_categories', {})
    classification_categories = data.get('classification_categories', {})

    written = []
    for im in tqdm(data['images'], desc='Writing XMP sidecars'):
        if im.get('detections') is None:
            continue
        image_path = os.path.join(image_folder, im['file'])
        if not os.path.isfile(image_path):
            continue
        tags = _tags_for_image(
            im, detection_categories, classification_categories,
            confidence_threshold, classification_threshold, tag_prefix)
        written.append(write_xmp_sidecar(image_path, tags))

    print('Wrote {} XMP sidecars'.format(len(written)))
    return written


def main():
    parser = argparse.ArgumentParser(
        description='Write MD detections into XMP sidecar tags')
    parser.add_argument('results_file')
    parser.add_argument('image_folder')
    parser.add_argument('--confidence_threshold', type=float, default=0.2)

    if len(sys.argv[1:]) == 0:
        parser.print_help()
        parser.exit()

    args = parser.parse_args()
    write_results_to_xmp(args.results_file, args.image_folder,
                         confidence_threshold=args.confidence_threshold)


if __name__ == '__main__':
    main()
