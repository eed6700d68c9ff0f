"""
Tests for the WI download-bundle tooling, push-payload machinery, and
the download_wi_projects workflow stages — all hermetic (synthetic CSV
bundles, fake transports, no network).
"""

import json
import os
import uuid

import numpy as np
import pytest

from PIL import Image

from megadetector_tpu.utils import wi_platform_utils as wi


GUIDS = [str(uuid.uuid4()) for _ in range(4)]
PROJECT_ID = 2013431


def _write_bundle(folder, project_id=PROJECT_ID):
    """A synthetic WI download bundle with an images_<id>.csv."""

    import pandas as pd
    os.makedirs(folder, exist_ok=True)
    rows = []
    species = [('mammalia', 'rodentia', 'rodent', 0, 'Computer vision'),
               ('mammalia', 'carnivora', 'puma', 0, 'Jane Expert'),
               ('', '', 'blank', 1, 'Jane Expert'),
               ('', '', '', 0, '')]
    for guid, (cls, order, common, is_blank, ident) in zip(GUIDS,
                                                           species):
        rows.append({
            'project_id': project_id,
            'deployment_id': 'dep001',
            'image_id': guid,
            'filename': guid + '.JPG',
            'location': 'gs://bucket_{}/deployment/2241000/prod/'
                        'directUpload/{}.JPG'.format(project_id, guid),
            'identified_by': ident,
            'wi_taxon_id': str(uuid.uuid4()),
            'class': cls,
            'order': order,
            'family': '',
            'genus': '',
            'species': '',
            'common_name': common,
            'is_blank': is_blank,
            'number_of_objects': 1,
            'timestamp': '2024-01-0{} 10:00:00'.format(
                GUIDS.index(guid) + 1),
        })
    pd.DataFrame(rows).to_csv(
        os.path.join(folder, 'images_{}.csv'.format(project_id)),
        index=False)
    return rows


def test_read_images_from_download_bundle(tmp_path):
    bundle = str(tmp_path / 'bundle')
    _write_bundle(bundle)
    records = wi.read_images_from_download_bundle(bundle)
    assert set(records.keys()) == set(GUIDS)
    r = records[GUIDS[0]][0]
    assert r['deployment_id'] == 'dep001'
    # Empty values normalized to ''
    assert records[GUIDS[3]][0]['identified_by'] == ''
    # Non-matching folder
    assert wi.read_images_from_download_bundle(
        str(tmp_path / 'bundle2' / 'nope')) is None \
        if os.path.isdir(str(tmp_path / 'bundle2' / 'nope')) else True


def test_find_images_in_identify_tab(tmp_path):
    with_identify = str(tmp_path / 'with')
    rows = _write_bundle(with_identify)
    excluding = str(tmp_path / 'without')
    import pandas as pd
    os.makedirs(excluding)
    pd.DataFrame(rows[2:]).to_csv(
        os.path.join(excluding, 'images_{}.csv'.format(PROJECT_ID)),
        index=False)
    identify_records = wi.find_images_in_identify_tab(
        with_identify, excluding)
    assert {r['image_id'] for r in identify_records} == set(GUIDS[:2])


def test_url_to_relative_path():
    url = 'gs://b/deployment/224/prod/directUpload/abc_thumb.JPG'
    assert wi.url_to_relative_path(url, 'none') == \
        'b/deployment/224/prod/directUpload/abc_thumb.JPG'
    assert wi.url_to_relative_path(url, 'guid') == 'abc_thumb.JPG'
    assert wi.url_to_relative_path(url, 'deployment') == \
        'deployment/224/prod/directUpload/abc.JPG'
    with pytest.raises(ValueError):
        wi.url_to_relative_path(url, 'bogus')


def test_write_download_commands(tmp_path):
    bundle = str(tmp_path / 'bundle')
    _write_bundle(bundle)
    records = wi.read_images_from_download_bundle(bundle)
    base = str(tmp_path / 'dl')
    master = wi.write_download_commands(records, base,
                                        n_download_workers=2,
                                        script_extension='sh')
    assert os.path.isfile(master)
    with open(master) as f:
        master_text = f.read()
    assert 'wait' in master_text
    worker_files = [fn for fn in os.listdir(base)
                    if fn.startswith('download_wi_images.') and
                    fn != os.path.basename(master)]
    n_commands = 0
    for fn in worker_files:
        with open(os.path.join(base, fn)) as f:
            lines = [l for l in f.read().splitlines() if l]
        for line in lines:
            assert line.startswith('gcloud storage cp --no-clobber')
        n_commands += len(lines)
    assert n_commands == len(GUIDS)

    # Existing files are skipped unless force_download
    existing_rel = wi.url_to_relative_path(
        list(records.values())[0][0]['location'])
    existing_abs = os.path.join(base, existing_rel)
    os.makedirs(os.path.dirname(existing_abs), exist_ok=True)
    open(existing_abs, 'w').write('x')
    wi.write_download_commands(records, base, n_download_workers=1,
                               script_extension='sh')
    with open(os.path.join(base, 'download_wi_images.00.sh')) as f:
        assert len([l for l in f.read().splitlines()
                    if l.startswith('gcloud')]) == len(GUIDS) - 1


def test_write_prefix_download_command(tmp_path):
    bundle = str(tmp_path / 'bundle')
    _write_bundle(bundle)
    records = wi.read_images_from_download_bundle(bundle)
    base = str(tmp_path / 'dl')
    script = wi.write_prefix_download_command(records, base)
    with open(script) as f:
        cmd = f.read().strip()
    assert cmd.startswith('gcloud storage cp -r --no-clobber')
    assert 'gs://bucket_{}/deployment/'.format(PROJECT_ID) in cmd


def test_payload_generation_and_validation():
    payload = wi.generate_blank_prediction_payload(
        str(uuid.uuid4()), '1234')
    assert wi.validate_payload(payload)
    payload = wi.generate_no_cv_result_payload(str(uuid.uuid4()), 99)
    assert wi.validate_payload(payload)

    detections = [{'category': '1', 'conf': 0.1,
                   'bbox': [0.1, 0.1, 0.2, 0.2]}]
    from megadetector_tpu.utils.wi_taxonomy_utils import \
        animal_prediction_string
    payload = wi.generate_payload_for_prediction_string(
        str(uuid.uuid4()), 7, animal_prediction_string,
        detections=detections)
    assert wi.validate_payload(payload)
    det = payload['predictions'][0]['detections'][0]
    assert det['label'] == 'animal'
    # Confidence floored at MIN_MD_OUTPUT_CONFIDENCE
    assert det['conf'] == wi.MIN_MD_OUTPUT_CONFIDENCE

    with pytest.raises(AssertionError):
        wi.generate_payload_for_prediction_string(
            str(uuid.uuid4()), 7, 'not-a-prediction-string')


def test_wi_result_to_prediction_string():
    r = {'wi_taxon_id': 'abc', 'class': 'Mammalia', 'order': 'Rodentia',
         'family': '', 'genus': '', 'species': '',
         'common_name': 'Rodent'}
    assert wi.wi_result_to_prediction_string(r) == \
        'abc;mammalia;rodentia;;;;rodent'
    r['family'] = float('nan')
    assert wi.wi_result_to_prediction_string(r) == \
        'abc;mammalia;rodentia;;;;rodent'


def test_record_is_unidentified():
    assert wi.record_is_unidentified({'identified_by': float('nan')})
    assert wi.record_is_unidentified({'identified_by': ''})
    assert wi.record_is_unidentified(
        {'identified_by': 'Computer vision'})
    assert not wi.record_is_unidentified({'identified_by': 'A Human'})


def test_record_lists_are_identical():
    a = [{'image_id': 'x', 'v': float('nan')}]
    b = [{'image_id': 'x', 'v': float('nan')}]
    assert wi.record_lists_are_identical(a, b)
    b = [{'image_id': 'x', 'v': 1.0}]
    assert not wi.record_lists_are_identical(a, b)
    assert not wi.record_lists_are_identical(a, [])


def test_push_results_with_fake_transport():
    calls = []

    def transport(method, url, headers=None, payload=None):
        calls.append((method, url, headers, payload))
        return {'ok': True}

    payloads = [wi.generate_blank_prediction_payload(
        str(uuid.uuid4()), '1') for _ in range(3)]
    headers = wi.prepare_data_update_auth_headers('tok123')
    assert headers['Authorization'] == 'Bearer tok123'
    codes = wi.parallel_push_results_for_images(
        payloads, headers, transport=transport, n_workers=2)
    assert codes == [200, 200, 200]
    assert len(calls) == 3
    assert all(c[1] == wi.PROCESS_CV_RESPONSE_URL for c in calls)

    def failing_transport(method, url, headers=None, payload=None):
        import urllib.error
        raise urllib.error.HTTPError(url, 403, 'Forbidden', {}, None)

    code = wi.push_results_for_images(payloads[0], headers,
                                      transport=failing_transport)
    assert code == 403


def test_get_auth_token(tmp_path):
    def transport(method, url, headers=None, payload=None):
        assert payload == {'clientId': 'id1', 'clientSecret': 's3cret'}
        return {'token': 'tok-abc'}

    secret_file = str(tmp_path / 'secret.json')
    with open(secret_file, 'w') as f:
        json.dump({'clientId': 'id1', 'clientSecret': 's3cret'}, f)
    assert wi.get_auth_token(secret_file, transport=transport) == \
        'tok-abc'

    def bad_transport(method, url, headers=None, payload=None):
        return {}

    assert wi.get_auth_token(
        {'clientId': 'id1', 'clientSecret': 's3cret'},
        transport=bad_transport) is None


@pytest.fixture
def wi_base(tmp_path):
    """A base folder with one bundle + downloaded images on disk."""

    base = str(tmp_path / 'wi')
    csv_base = os.path.join(base, 'csv_downloads')
    bundle = os.path.join(
        csv_base,
        'wildlife-insights_{}_project-{}_data'.format(
            uuid.uuid4(), PROJECT_ID))
    rows = _write_bundle(bundle)

    # Put images on disk where the deployment-flattened COCO expects
    # them, plus a redundant thumbnail
    image_folder = os.path.join(base, 'images', str(PROJECT_ID))
    rng = np.random.RandomState(0)
    for row in rows:
        target = os.path.join(image_folder, 'dep001',
                              row['image_id'] + '.JPG')
        os.makedirs(os.path.dirname(target), exist_ok=True)
        Image.fromarray(rng.randint(0, 255, (40, 60, 3),
                                    dtype=np.uint8)).save(target)
    thumb = os.path.join(image_folder, 'dep001',
                         rows[0]['image_id'] + '_500.JPG')
    Image.fromarray(rng.randint(0, 255, (10, 15, 3),
                                dtype=np.uint8)).save(thumb)
    return base


def test_download_wi_projects_workflow(wi_base):
    from megadetector_tpu.workflows import download_wi_projects as dwp

    # prepare: scripts + records + cache
    projects = dwp.prepare_project_downloads(wi_base)
    assert len(projects) == 1
    p = projects[0]
    assert p['id'] == PROJECT_ID
    assert len(p['image_urls_to_download']) == len(GUIDS)
    records_file = os.path.join(p['image_folder'],
                                'image_records.json')
    assert os.path.isfile(records_file)
    script = os.path.join(p['image_folder'],
                          'download_images_{}.sh'.format(PROJECT_ID))
    assert os.path.isfile(script)
    assert os.path.isfile(
        os.path.join(wi_base, 'wi_project_info.json'))

    # Second prepare run skips (no force)
    projects2 = dwp.prepare_project_downloads(wi_base)
    assert len(projects2) == 1
    assert len(projects2[0]['image_urls_to_download']) == len(GUIDS)

    # check: the files on disk are at deployment-flattened paths, which
    # differ from url_to_relative_path's layout, so they count as
    # "extra"; requested URLs count as missing
    report = dwp.check_download_completion(wi_base)
    assert PROJECT_ID in report
    r = report[PROJECT_ID]
    assert len(r['missing']) == len(GUIDS)
    assert len(r['extra']) >= len(GUIDS)

    # thumbnails
    deleted = dwp.delete_redundant_thumbnails(wi_base)
    assert len(deleted) == 1 and '_500' in deleted[0]
    assert not os.path.exists(deleted[0])

    # coco + sequences
    coco_files = dwp.convert_projects_to_coco(wi_base)
    assert len(coco_files) == 1
    with open(coco_files[0]) as f:
        d = json.load(f)
    assert len(d['images']) == len(GUIDS)
    assert any('seq_id' in im for im in d['images'])

    # sample (blanks excluded)
    copied = dwp.sample_project_images(wi_base,
                                       n_samples_per_project=10)
    assert 1 <= len(copied) <= len(GUIDS)
    for fn in copied:
        assert os.path.isfile(fn)
