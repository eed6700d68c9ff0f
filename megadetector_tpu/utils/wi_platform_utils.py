"""
Wildlife Insights platform client: fetch projects/deployments/images and
push identifications through the WI API.

Behavioral contract follows the reference
(megadetector/utils/wi_platform_utils.py, 1199 LoC of requests-based
API calls): paged listing of projects/deployments/images and download of
image URLs. The HTTP transport is injectable (any callable
(method, url, headers, json) -> dict), so the client is testable offline
and adaptable to proxied environments; the default transport uses
urllib. All calls require a WI API token.
"""

import json
import os
import urllib.request

WI_API_BASE = 'https://api.wildlifeinsights.org/api/v1'


def _default_transport(method, url, headers=None, payload=None,
                       timeout=60):
    """urllib-based JSON transport."""

    data = json.dumps(payload).encode('utf-8') if payload is not None \
        else None
    req = urllib.request.Request(url, data=data, method=method,
                                 headers=headers or {})
    if payload is not None:
        req.add_header('Content-Type', 'application/json')
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read().decode('utf-8'))


class WIPlatformClient:
    """
    Minimal WI API client.

    Args:
        api_token: bearer token
        transport: optional callable replacing the HTTP layer (tests,
            proxies)
        api_base: API root
    """

    def __init__(self, api_token, transport=None, api_base=WI_API_BASE):
        self.api_token = api_token
        self.transport = transport or _default_transport
        self.api_base = api_base.rstrip('/')

    def _headers(self):
        return {'Authorization': 'Bearer {}'.format(self.api_token)}

    def _get(self, path, params=None):
        url = self.api_base + path
        if params:
            from urllib.parse import urlencode
            url += '?' + urlencode(params)
        return self.transport('GET', url, headers=self._headers())

    def _paged(self, path, data_key='data', page_size=100,
               max_pages=1000):
        """Iterate a paged listing endpoint."""

        out = []
        for page in range(1, max_pages + 1):
            resp = self._get(path, {'page': page,
                                    'pageSize': page_size})
            rows = resp.get(data_key, [])
            out.extend(rows)
            meta = resp.get('meta', {})
            if not rows or page >= int(meta.get('totalPages', page)):
                break
        return out

    def list_projects(self):
        """All projects visible to the token."""

        return self._paged('/projects')

    def list_deployments(self, project_id):
        """Deployments (camera placements) of a project."""

        return self._paged('/projects/{}/deployments'.format(project_id))

    def list_images(self, project_id, deployment_id=None):
        """Image records of a project (optionally one deployment)."""

        path = '/projects/{}/images'.format(project_id)
        if deployment_id is not None:
            path = '/projects/{}/deployments/{}/images'.format(
                project_id, deployment_id)
        return self._paged(path)

    def download_project_images(self, project_id, output_folder,
                                n_workers=8, url_key='downloadUrl'):
        """
        Download every image of a project into [output_folder]
        (deployment-id subfolders). Returns {url: status dict}.
        """

        from megadetector_tpu.utils.url_utils import \
            parallel_download_urls

        images = self.list_images(project_id)
        url_to_target = {}
        for im in images:
            url = im.get(url_key)
            if not url:
                continue
            deployment = str(im.get('deploymentId', 'unknown'))
            fn = im.get('filename') or url.split('/')[-1].split('?')[0]
            url_to_target[url] = os.path.join(output_folder, deployment,
                                              fn)
        return parallel_download_urls(url_to_target,
                                      n_workers=n_workers)

    def upload_identifications(self, project_id, md_results,
                               confidence_threshold=0.2,
                               batch_size=100):
        """
        Push MD-format detections as WI identification records
        ({'images': [...]} dict or path). Returns the list of API
        responses. The payload mapping mirrors postprocessing/md_to_wi.
        """

        from megadetector_tpu.postprocessing.md_to_wi import md_to_wi
        import tempfile

        if isinstance(md_results, str):
            predictions = md_to_wi(
                md_results, detection_threshold=confidence_threshold)
        else:
            fd, tmp = tempfile.mkstemp(suffix='.json')
            os.close(fd)
            try:
                from megadetector_tpu.utils.ct_utils import write_json
                write_json(tmp, md_results, force_str=True)
                predictions = md_to_wi(
                    tmp, detection_threshold=confidence_threshold)
            finally:
                try:
                    os.remove(tmp)
                except OSError:
                    pass

        responses = []
        records = predictions['predictions']
        for i in range(0, len(records), batch_size):
            payload = {'identifications': records[i:i + batch_size]}
            responses.append(self.transport(
                'POST',
                self.api_base +
                '/projects/{}/identifications'.format(project_id),
                headers=self._headers(), payload=payload))
        return responses
