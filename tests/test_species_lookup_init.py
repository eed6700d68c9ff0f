"""
initialize_taxonomy_lookup: download/unzip/load orchestration, run fully
offline via local zip archives and an injected download function.
"""

import os
import zipfile

import pytest

from megadetector_tpu.taxonomy_mapping import species_lookup as sl


GBIF_TAXON_TSV = (
    'taxonID\tparentNameUsageID\tcanonicalName\ttaxonRank\tkingdom\n'
    '1\t\tFelidae\tfamily\tAnimalia\n'
    '2\t1\tPuma\tgenus\tAnimalia\n'
    '3\t2\tPuma concolor\tspecies\tAnimalia\n'
    '4\t\tQuercus\tgenus\tPlantae\n'
)

GBIF_VERNACULAR_TSV = (
    'taxonID\tvernacularName\tlanguage\n'
    '3\tCougar\ten\n'
    '3\tPuma\tfr\n'
)

INAT_TAXA_CSV = (
    'id,parentNameUsageID,kingdom,scientificName,taxonRank\n'
    '10,,Animalia,Canidae,family\n'
    '11,https://www.inaturalist.org/taxa/10,Animalia,Canis,genus\n'
    '12,https://www.inaturalist.org/taxa/11,Animalia,Canis latrans,'
    'species\n'
)

INAT_VERNACULAR_CSV = (
    'id,vernacularName\n'
    '12,Coyote\n'
)


def _make_archives(folder):
    gbif_zip = os.path.join(folder, 'backbone.zip')
    with zipfile.ZipFile(gbif_zip, 'w') as z:
        z.writestr('Taxon.tsv', GBIF_TAXON_TSV)
        z.writestr('VernacularName.tsv', GBIF_VERNACULAR_TSV)
    inat_zip = os.path.join(folder, 'inaturalist-taxonomy.dwca.zip')
    with zipfile.ZipFile(inat_zip, 'w') as z:
        z.writestr('taxa.csv', INAT_TAXA_CSV)
        z.writestr('VernacularNames-english.csv', INAT_VERNACULAR_CSV)
    return {'backbone.zip': gbif_zip,
            'inaturalist-taxonomy.dwca.zip': inat_zip}


def test_initialize_taxonomy_lookup_offline(tmp_path):
    staging = str(tmp_path / 'staging')
    os.makedirs(staging)
    archives = _make_archives(staging)
    downloads = []

    def fake_download(url, dest):
        downloads.append(url)
        name = url.split('/')[-1]
        with open(archives[name], 'rb') as src, open(dest, 'wb') as dst:
            dst.write(src.read())

    taxonomy_dir = str(tmp_path / 'taxonomy')
    lookups = sl.initialize_taxonomy_lookup(
        taxonomy_dir, download_fn=fake_download, verbose=False)

    assert len(downloads) == 2
    gbif = lookups['gbif']
    inat = lookups['inat']

    # GBIF: scientific name, plant filtered out, vernacular synonym
    node = gbif.lookup('puma concolor')
    assert node is not None and node.level == 'species'
    assert gbif.lookup('quercus') is None
    assert gbif.lookup('cougar') is not None
    # French vernacular excluded by the default language filter; 'puma'
    # still resolves through the scientific genus name
    assert gbif.lookup('puma').level == 'genus'

    # iNat: URL-style parent ids resolve into a chain; vernacular maps
    coyote = inat.lookup('coyote')
    assert coyote is not None and coyote.name.lower() == 'canis latrans'
    chain = inat.taxonomy.ancestors(coyote)
    assert any(n.name.lower() == 'canidae' for n in chain)

    # Second call with files in place: no new downloads
    sl.initialize_taxonomy_lookup(
        taxonomy_dir, download_fn=fake_download, verbose=False)
    assert len(downloads) == 2


def test_initialize_requires_expected_members(tmp_path):
    bad = str(tmp_path / 'bad.zip')
    with zipfile.ZipFile(bad, 'w') as z:
        z.writestr('nothing.txt', 'x')

    def fake_download(url, dest):
        with open(bad, 'rb') as src, open(dest, 'wb') as dst:
            dst.write(src.read())

    with pytest.raises(AssertionError):
        sl.initialize_taxonomy_lookup(
            str(tmp_path / 'tax'), download_fn=fake_download,
            verbose=False)
