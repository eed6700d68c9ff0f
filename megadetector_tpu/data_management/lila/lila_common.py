"""
LILA (lila.science) dataset tooling: the camera-trap dataset index,
metadata download, and per-dataset URL construction.

Behavioral contract follows the reference
(megadetector/data_management/lila/lila_common.py:324): read the LILA
camera-trap dataset index (a hosted CSV), download/unzip per-dataset
metadata files, and build image URLs. Network access is required for the
real index; every function accepts a local override so offline tests and
air-gapped deployments work from cached files.
"""

import json
import os
import zipfile

from megadetector_tpu.utils.url_utils import download_url
from megadetector_tpu.utils.ct_utils import write_json

LILA_BASE_URLS = {
    'azure': 'https://lilawildlife.blob.core.windows.net/lila-wildlife/',
    'gcp': 'https://storage.googleapis.com/public-datasets-lila/',
}

LILA_DATASET_INDEX_URL = \
    'https://lila.science/public/lila_camera_trap_datasets.csv'


def get_lila_dataset_index(metadata_dir=None, index_url=None,
                           local_index_file=None):
    """
    The LILA dataset index as {dataset name: {column: value}}. Reads
    [local_index_file] when given (offline mode), else downloads the
    hosted CSV into [metadata_dir].
    """

    import csv

    if local_index_file is None:
        assert metadata_dir is not None, \
            'Need metadata_dir (or a local index file)'
        os.makedirs(metadata_dir, exist_ok=True)
        local_index_file = download_url(
            index_url or LILA_DATASET_INDEX_URL,
            os.path.join(metadata_dir, 'lila_camera_trap_datasets.csv'))

    datasets = {}
    with open(local_index_file, newline='', encoding='utf-8') as f:
        for row in csv.DictReader(f):
            name = row.get('name') or row.get('short_name')
            if not name:
                continue
            datasets[name] = dict(row)
    return datasets


def read_lila_metadata(dataset_entry, metadata_dir):
    """
    Download (and unzip if needed) one dataset's metadata .json; returns
    the local path to the json file.
    """

    # Offline/local entries point straight at a metadata file
    if dataset_entry.get('metadata_path'):
        return dataset_entry['metadata_path']

    url = dataset_entry.get('json_url') or dataset_entry.get('metadata_url')
    assert url, 'Dataset entry has no metadata URL'
    os.makedirs(metadata_dir, exist_ok=True)
    local = download_url(url, os.path.join(metadata_dir,
                                           url.split('/')[-1]))
    if local.endswith('.zip'):
        with zipfile.ZipFile(local) as zf:
            json_names = [n for n in zf.namelist()
                          if n.endswith('.json')]
            assert len(json_names) >= 1
            zf.extract(json_names[0], metadata_dir)
            return os.path.join(metadata_dir, json_names[0])
    return local


def lila_image_url(dataset_entry, image_file_name, preferred_cloud='gcp'):
    """Construct the public URL for one image of a LILA dataset."""

    base = dataset_entry.get('{}_base_url'.format(preferred_cloud))
    if not base:
        prefix = dataset_entry.get('image_base_url',
                                   LILA_BASE_URLS[preferred_cloud])
        base = prefix
    if not base.endswith('/'):
        base += '/'
    return base + image_file_name.lstrip('/')


def select_lila_images_by_species(cct_json_file, species_of_interest):
    """
    Image file names in a LILA CCT metadata file whose annotations
    include any of [species_of_interest] (case-insensitive). This is
    the selection step of the reference's
    data_management/lila/download_lila_subset.py workflow.
    """

    from megadetector_tpu.data_management.cct_json_utils import \
        IndexedJsonDb

    wanted = {s.lower() for s in species_of_interest}
    db = IndexedJsonDb(cct_json_file)
    files = []
    for im in db.db['images']:
        classes = {c.lower() for c in db.get_classes_for_image(im)}
        if classes & wanted:
            files.append(im['file_name'])
    return files


def download_lila_subset(dataset_entry, image_file_names, output_folder,
                         preferred_cloud='gcp', n_workers=20,
                         dry_run=False):
    """
    Download a subset of one LILA dataset's images into
    [output_folder], preserving relative paths (reference:
    data_management/lila/download_lila_subset.py). Returns the
    {url: target} mapping when dry_run (offline tests), else the
    per-URL download status dict from parallel_download_urls.
    """

    from megadetector_tpu.utils.url_utils import parallel_download_urls

    url_to_target = {}
    for fn in image_file_names:
        url = lila_image_url(dataset_entry, fn,
                             preferred_cloud=preferred_cloud)
        url_to_target[url] = os.path.join(output_folder,
                                          fn.lstrip('/'))
    if dry_run:
        return url_to_target
    return parallel_download_urls(url_to_target, n_workers=n_workers)


def generate_lila_per_image_labels(cct_json_file, output_file=None):
    """
    Flatten a LILA CCT metadata file to one record per image with its
    class names (the reference's per-image label table,
    data_management/lila/generate_lila_per_image_labels.py).
    """

    from megadetector_tpu.data_management.cct_json_utils import \
        IndexedJsonDb

    db = IndexedJsonDb(cct_json_file)
    records = []
    for im in db.db['images']:
        records.append({
            'image_id': im['id'],
            'file_name': im['file_name'],
            'location': im.get('location'),
            'datetime': im.get('datetime'),
            'labels': db.get_classes_for_image(im),
        })
    if output_file is not None:
        write_json(output_file, records, force_str=True)
    return records
