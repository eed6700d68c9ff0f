"""Offline tests for the WI platform client (injectable transport)."""

import json
import os

from megadetector_tpu.utils.wi_platform_utils import WIPlatformClient


class FakeTransport:
    """Records calls and serves canned paged responses."""

    def __init__(self, routes):
        self.routes = routes
        self.calls = []

    def __call__(self, method, url, headers=None, payload=None):
        self.calls.append((method, url, headers, payload))
        path = url.split('/api/v1', 1)[1]
        base = path.split('?')[0]
        page = 1
        if '?' in path:
            from urllib.parse import parse_qs
            qs = parse_qs(path.split('?', 1)[1])
            page = int(qs.get('page', ['1'])[0])
        pages = self.routes.get((method, base), [{'data': []}])
        return pages[min(page, len(pages)) - 1]


def test_paged_listing_crosses_pages():
    routes = {
        ('GET', '/projects'): [
            {'data': [{'id': 1}, {'id': 2}],
             'meta': {'totalPages': 2}},
            {'data': [{'id': 3}], 'meta': {'totalPages': 2}},
        ]
    }
    t = FakeTransport(routes)
    client = WIPlatformClient('tok', transport=t)
    projects = client.list_projects()
    assert [p['id'] for p in projects] == [1, 2, 3]
    # Auth header on every call
    assert all(c[2]['Authorization'] == 'Bearer tok' for c in t.calls)
    assert len(t.calls) == 2


def test_list_images_deployment_scoped():
    routes = {
        ('GET', '/projects/7/deployments/d1/images'): [
            {'data': [{'id': 'im1'}], 'meta': {'totalPages': 1}},
        ]
    }
    t = FakeTransport(routes)
    client = WIPlatformClient('tok', transport=t)
    images = client.list_images(7, deployment_id='d1')
    assert images == [{'id': 'im1'}]


def test_upload_identifications_batches(tmp_path):
    md = {
        'images': [
            {'file': 'a.jpg',
             'detections': [
                 {'category': '1', 'conf': 0.9,
                  'bbox': [0.1, 0.1, 0.2, 0.2]}]},
            {'file': 'b.jpg', 'detections': []},
        ],
        'detection_categories': {'1': 'animal'},
        'info': {'format_version': '1.4'},
    }
    md_file = os.path.join(str(tmp_path), 'md.json')
    with open(md_file, 'w') as f:
        json.dump(md, f)

    t = FakeTransport({})
    client = WIPlatformClient('tok', transport=t)
    responses = client.upload_identifications(5, md_file, batch_size=1)
    posts = [c for c in t.calls if c[0] == 'POST']
    assert len(posts) == len(responses) == 2
    assert posts[0][1].endswith('/projects/5/identifications')
    payload = posts[0][3]
    assert 'identifications' in payload and len(
        payload['identifications']) == 1
