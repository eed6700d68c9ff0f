"""
Wildlife Insights / SpeciesNet taxonomy utilities (reference:
megadetector/utils/wi_taxonomy_utils.py): prediction-string parsing,
predictions.json <-> MD-format conversion, instances.json preparation,
prediction-file merging/validation, geofence-adjustment reporting, and a
TaxonomyHandler over a 7-part-string taxonomy table.

WI prediction strings are 7 semicolon-separated tokens:
"uuid;class;order;family;genus;species;common name". Semantic matching
here keys off the taxonomic tokens and common name, never the UUID.
"""

import json
import os

from collections import defaultdict

from megadetector_tpu.utils import ct_utils

TAXONOMY_LEVELS = ['class', 'order', 'family', 'genus', 'species']

# Well-known non-taxonomic prediction strings (UUIDs vary by taxonomy
# release; matching is by suffix tokens)
blank_prediction_string = \
    'f1856211-cfb7-4a5b-9158-c0f72fd09ee6;;;;;;blank'
no_cv_result_prediction_string = \
    'f2efdae9-efb8-48fb-8a91-eccf79ab4ffb;no cv result;;;;;no cv result'
animal_prediction_string = \
    '1f689929-883d-4dae-958c-3d57ab5b6c16;;;;;;animal'
human_prediction_string = ('990ae9dd-7a59-4344-afcb-1b7b21368000;'
                           'mammalia;primates;hominidae;homo;sapiens;'
                           'human')
vehicle_prediction_string = \
    'e2895ed5-780b-48f6-8a11-9e27cb594511;;;;;;vehicle'

current_format_version = '1.6'


#%% Prediction-string helpers


def is_valid_prediction_string(s):
    """A prediction string has exactly 7 semicolon-separated tokens and
    is lowercase."""

    return isinstance(s, str) and s.count(';') == 6 and s == s.lower()


def is_valid_taxonomy_string(s):
    """A taxonomy string is a prediction string without the UUID (6
    tokens: class;order;family;genus;species;common name)."""

    return isinstance(s, str) and s.count(';') == 5 and s == s.lower()


def get_common_name_from_prediction_string(s):
    """Last token of a prediction string."""

    tokens = s.split(';')
    assert len(tokens) == 7, 'Invalid prediction string {}'.format(s)
    return tokens[-1].strip()


def clean_taxonomy_string(s):
    """Strip the UUID from a 7-token prediction string (7 -> 6 tokens);
    passes 6-token strings through."""

    tokens = s.split(';')
    if len(tokens) == 7:
        return ';'.join(tokens[1:])
    assert len(tokens) == 6, 'Invalid taxonomy string {}'.format(s)
    return s


def taxonomy_level_to_string(k):
    """0 -> 'class', ..., 4 -> 'species' (5/6 map to non-taxonomic
    levels used for sorting)."""

    if 0 <= k < len(TAXONOMY_LEVELS):
        return TAXONOMY_LEVELS[k]
    raise ValueError('Invalid taxonomy level index {}'.format(k))


def taxonomy_level_string_to_index(s):
    return TAXONOMY_LEVELS.index(str(s).lower())


def taxonomy_level_index(s):
    """Index of the most specific non-empty level of a prediction or
    taxonomy string (-1 for non-taxonomic strings like 'blank')."""

    tokens = clean_taxonomy_string(s).split(';')[:5]
    level = -1
    for i, t in enumerate(tokens):
        if t.strip():
            level = i
    return level


def is_taxonomic_prediction_string(s):
    """True when at least one taxonomic token is non-empty."""

    return taxonomy_level_index(s) >= 0


def get_kingdom(prediction_string):
    """Rough kingdom inference: mammals/birds/reptiles/etc live in
    'animalia'; the class token is the best available signal."""

    tokens = clean_taxonomy_string(prediction_string).split(';')
    return 'animalia' if tokens[0].strip() else ''


def is_human_classification(prediction_string):
    s = prediction_string.lower()
    return ('homo;sapiens' in s or ';human' in s.rsplit(';', 1)[0] or
            s.endswith(';human') or 'homo species' in s)


def is_vehicle_classification(prediction_string):
    return prediction_string.lower().endswith(';vehicle')


def is_animal_classification(prediction_string):
    """Animal = taxonomic and not human, or the generic 'animal'."""

    s = prediction_string.lower()
    if s.endswith(';animal'):
        return True
    return is_taxonomic_prediction_string(s) and \
        not is_human_classification(s)


def taxonomy_info_to_taxonomy_string(taxonomy_info,
                                     include_taxon_id_and_common_name=False):
    """{'class': ..., 'order': ..., ...} -> taxonomy string."""

    tokens = [str(taxonomy_info.get(level, '') or '').lower()
              for level in TAXONOMY_LEVELS]
    if include_taxon_id_and_common_name:
        tokens = [str(taxonomy_info.get('taxon_id', ''))] + tokens + \
            [str(taxonomy_info.get('common_name', '')).lower()]
    return ';'.join(tokens)


#%% predictions.json <-> MD format


def generate_md_results_from_predictions_json(predictions_json_file,
                                              md_results_file=None,
                                              base_folder=None,
                                              convert_human_to_person=True,
                                              convert_homo_species_to_human=True,
                                              verbose=False):
    """
    Convert a SpeciesNet ensemble predictions.json file (or dict) to MD
    format (reference: wi_taxonomy_utils.py:504-779): detections copied
    with their categories, the whole-image 'prediction' (or top
    'classifications' entry) attached to every detection, fake
    whole-image detections created for non-blank images with no
    detections, categories mapped to common names with the 7-token
    strings kept in classification_category_descriptions.
    """

    if isinstance(predictions_json_file, str):
        with open(predictions_json_file) as f:
            predictions = json.load(f)
    else:
        predictions = dict(predictions_json_file)
    predictions = predictions['predictions']

    if base_folder is not None:
        base_folder = base_folder.replace('\\', '/')

    detection_categories = {}
    classification_string_to_id = {}
    fake_detections = []
    images_out = []
    n_base_replacements = 0

    for im_in in predictions:
        fn = im_in['filepath'].replace('\\', '/')
        if base_folder is not None:
            for prefix in (base_folder + '/', base_folder):
                if fn.startswith(prefix):
                    fn = fn[len(prefix):]
                    n_base_replacements += 1
                    break
        im_out = {'file': fn}

        if 'failures' in im_in and im_in['failures']:
            im_out['failure'] = str(im_in['failures'])
            im_out['detections'] = None
            images_out.append(im_out)
            continue

        im_out['detections'] = []
        for det_in in im_in.get('detections') or []:
            cat = str(det_in['category'])
            label = det_in.get('label', cat)
            if cat in detection_categories:
                assert detection_categories[cat] == label, \
                    'Inconsistent detection category {}'.format(cat)
            else:
                detection_categories[cat] = label
            im_out['detections'].append({
                'category': cat,
                'conf': det_in['conf'],
                'bbox': det_in['bbox'],
            })

        class_to_assign = None
        class_confidence = None
        top_common_name = None

        classifications = im_in.get('classifications')
        if classifications:
            assert len(classifications['scores']) == \
                len(classifications['classes'])
            class_to_assign = classifications['classes'][0]
            class_confidence = classifications['scores'][0]
            top_common_name = get_common_name_from_prediction_string(
                class_to_assign)

        if 'prediction' in im_in:
            im_out['top_classification_common_name'] = top_common_name
            class_to_assign = im_in['prediction']
            if convert_homo_species_to_human and \
                    ('hominidae;homo' in class_to_assign or
                     'homo species' in class_to_assign):
                class_to_assign = human_prediction_string
            class_confidence = im_in['prediction_score']

        if class_to_assign is not None:
            if class_to_assign != blank_prediction_string and \
                    len(im_out['detections']) == 0:
                if verbose:
                    print('Creating fake whole-image detection '
                          'for {}'.format(fn))
                det_out = {'category': 'unknown',
                           'conf': class_confidence,
                           'bbox': [0, 0, 1, 1]}
                fake_detections.append(det_out)
                im_out['detections'].append(det_out)
            if class_to_assign not in classification_string_to_id:
                classification_string_to_id[class_to_assign] = \
                    str(len(classification_string_to_id))
            cat_id = classification_string_to_id[class_to_assign]
            for det in im_out['detections']:
                det['classifications'] = [[cat_id, class_confidence]]

        images_out.append(im_out)

    if base_folder is not None and n_base_replacements == 0:
        print('Warning: base folder {} never matched'.format(
            base_folder))

    if fake_detections:
        existing = [int(k) for k in detection_categories] or [-1]
        fake_id = str(max(existing) + 1)
        detection_categories[fake_id] = 'unknown'
        for det in fake_detections:
            det['category'] = fake_id

    images_out = ct_utils.sort_list_of_dicts_by_key(images_out, 'file')

    descriptions = {v: k for k, v in
                    classification_string_to_id.items()}
    classification_categories = {
        cat_id: get_common_name_from_prediction_string(s)
        for cat_id, s in descriptions.items()}

    if convert_human_to_person:
        for k, v in detection_categories.items():
            if v == 'human':
                detection_categories[k] = 'person'

    output = {
        'info': {'format_version': current_format_version,
                 'detector': 'converted_from_predictions_json'},
        'detection_categories': detection_categories,
        'classification_categories': classification_categories,
        'classification_category_descriptions': descriptions,
        'images': images_out,
    }

    if md_results_file is not None:
        ct_utils.write_json(md_results_file, output, force_str=True)
        from megadetector_tpu.postprocessing.validate_batch_results \
            import ValidateBatchResultsOptions, validate_batch_results
        v = ValidateBatchResultsOptions()
        v.raise_errors = True
        validate_batch_results(md_results_file, v)
    return output


def generate_predictions_json_from_md_results(md_results_file,
                                              predictions_json_file=None,
                                              base_folder=None):
    """
    MD results -> SpeciesNet predictions.json (detections only, for
    feeding the WI classifier; reference: wi_taxonomy_utils.py:782).
    """

    if isinstance(md_results_file, str):
        with open(md_results_file) as f:
            data = json.load(f)
    else:
        data = md_results_file

    categories = data.get('detection_categories', {})
    predictions = []
    for im in data['images']:
        fn = im['file']
        if base_folder is not None:
            fn = os.path.join(base_folder, fn).replace('\\', '/')
        p = {'filepath': fn}
        if im.get('failure'):
            p['failures'] = [im['failure']]
        else:
            p['detections'] = [{
                'category': det['category'],
                'label': categories.get(det['category'],
                                        det['category']),
                'conf': det['conf'],
                'bbox': det['bbox'],
            } for det in im.get('detections') or []]
        predictions.append(p)

    output = {'predictions': predictions}
    if predictions_json_file is not None:
        ct_utils.write_json(predictions_json_file, output,
                            force_str=True)
    return output


#%% instances.json / prediction-file plumbing


def generate_instances_json_from_folder(folder, country=None,
                                        admin1_region=None,
                                        output_file=None,
                                        recursive=True):
    """
    Build a SpeciesNet instances.json ({'instances': [{'filepath': ...,
    'country': ..., 'admin1_region': ...}]}) from an image folder
    (reference: wi_taxonomy_utils.py:854).
    """

    from megadetector_tpu.utils.path_utils import find_images

    images = find_images(folder, recursive=recursive)
    instances = []
    for fn in images:
        inst = {'filepath': fn.replace('\\', '/')}
        if country is not None:
            inst['country'] = country
        if admin1_region is not None:
            inst['admin1_region'] = admin1_region
        instances.append(inst)
    output = {'instances': instances}
    if output_file is not None:
        ct_utils.write_json(output_file, output, force_str=True)
    return output


def split_instances_into_n_batches(instances_json, n_batches,
                                   output_files=None):
    """Split an instances dict/file into N batch files (reference:
    wi_taxonomy_utils.py:932). Returns the list of output files."""

    if isinstance(instances_json, str):
        with open(instances_json) as f:
            data = json.load(f)
        base = os.path.splitext(instances_json)[0]
    else:
        data = instances_json
        base = 'instances'

    instances = data['instances']
    if output_files is None:
        output_files = ['{}_batch_{:03d}.json'.format(base, i)
                        for i in range(n_batches)]
    assert len(output_files) == n_batches

    for i, output_file in enumerate(output_files):
        ct_utils.write_json(
            output_file, {'instances': instances[i::n_batches]},
            force_str=True)
    return output_files


def merge_prediction_json_files(input_prediction_files,
                                output_prediction_file=None):
    """Merge predictions.json shards, asserting filepath uniqueness
    (reference: wi_taxonomy_utils.py:977)."""

    merged = []
    seen = set()
    for fn in input_prediction_files:
        with open(fn) as f:
            shard = json.load(f)
        for p in shard['predictions']:
            assert p['filepath'] not in seen, \
                'Duplicate filepath {}'.format(p['filepath'])
            seen.add(p['filepath'])
            merged.append(p)
    output = {'predictions': merged}
    if output_prediction_file is not None:
        ct_utils.write_json(output_prediction_file, output,
                            force_str=True)
    return output


def load_md_or_speciesnet_file(fn, verbose=False):
    """
    Load either an MD-format file or a predictions.json file, always
    returning MD format (reference: wi_taxonomy_utils.py:1014).
    """

    with open(fn) as f:
        data = json.load(f)
    if 'images' in data:
        return data
    assert 'predictions' in data, \
        '{} is neither MD format nor predictions.json'.format(fn)
    if verbose:
        print('Converting predictions.json {} to MD format'.format(fn))
    return generate_md_results_from_predictions_json(data)


def validate_predictions_file(fn, instances=None):
    """
    Sanity-check a predictions.json file (reference:
    wi_taxonomy_utils.py:1050): structure, score ordering, and (when
    [instances] is given) coverage. Returns the loaded dict.
    """

    with open(fn) as f:
        data = json.load(f)
    assert 'predictions' in data, 'Missing predictions key'
    filepaths = set()
    for p in data['predictions']:
        assert 'filepath' in p, 'Prediction missing filepath'
        filepaths.add(p['filepath'])
        c = p.get('classifications')
        if c is not None:
            assert len(c['classes']) == len(c['scores'])
            assert all(c['scores'][i] >= c['scores'][i + 1]
                       for i in range(len(c['scores']) - 1)), \
                'Unsorted classification scores in {}'.format(
                    p['filepath'])
        for det in p.get('detections') or []:
            assert 0 <= det['conf'] <= 1
    if instances is not None:
        if isinstance(instances, str):
            with open(instances) as f:
                instances = json.load(f)
        expected = {i['filepath'] for i in instances['instances']}
        missing = expected - filepaths
        assert not missing, \
            '{} instances missing from predictions'.format(len(missing))
    return data


def find_geofence_adjustments(ensemble_json_file, use_latin_names=False):
    """
    Count classifications changed by geofencing in an ensemble
    predictions.json file, via the 'classifications' (pre-geofence) vs
    'prediction' (post-ensemble) fields (reference:
    wi_taxonomy_utils.py:1113). Returns {'pre -> post': count} sorted
    descending.
    """

    if isinstance(ensemble_json_file, str):
        with open(ensemble_json_file) as f:
            data = json.load(f)
    else:
        data = ensemble_json_file

    rollup_pair_to_count = defaultdict(int)
    for p in data['predictions']:
        c = p.get('classifications')
        pred = p.get('prediction')
        if not c or pred is None:
            continue
        top = c['classes'][0]
        if top == pred:
            continue

        def name(s):
            if use_latin_names:
                tokens = clean_taxonomy_string(s).split(';')
                latin = ' '.join(t for t in tokens[3:5] if t).strip()
                return latin or tokens[0] or s
            return get_common_name_from_prediction_string(s)

        rollup_pair_to_count['{} -> {}'.format(name(top),
                                               name(pred))] += 1

    return dict(sorted(rollup_pair_to_count.items(),
                       key=lambda kv: -kv[1]))


#%% TaxonomyHandler


class TaxonomyHandler:
    """
    Lookup over a WI taxonomy release: maps common names and latin
    names to full 7-token prediction strings, and walks parent chains
    by truncating taxonomy levels (reference:
    wi_taxonomy_utils.py:1232).

    The taxonomy source is a text file with one prediction string per
    line (or a list of strings).
    """

    def __init__(self, taxonomy_source):
        if isinstance(taxonomy_source, str):
            with open(taxonomy_source) as f:
                lines = [line.strip() for line in f if line.strip()]
        else:
            lines = list(taxonomy_source)

        self.prediction_strings = []
        self.common_name_to_string = {}
        self.latin_name_to_string = {}
        for s in lines:
            s = s.strip().lower()
            if s.count(';') == 5:
                s = ';' + s  # tolerate uuid-less releases
            if not is_valid_prediction_string(s):
                continue
            self.prediction_strings.append(s)
            tokens = s.split(';')
            common = tokens[6].strip()
            if common:
                self.common_name_to_string.setdefault(common, s)
            genus, species = tokens[4].strip(), tokens[5].strip()
            if genus and species:
                self.latin_name_to_string.setdefault(
                    '{} {}'.format(genus, species), s)
            elif genus:
                self.latin_name_to_string.setdefault(genus, s)

    def string_for_name(self, name):
        """Prediction string for a common or latin name (or None)."""

        name = str(name).strip().lower()
        return self.common_name_to_string.get(
            name, self.latin_name_to_string.get(name))

    def parent_string(self, prediction_string):
        """Prediction string truncated one taxonomy level up (None at
        the top)."""

        tokens = prediction_string.split(';')
        assert len(tokens) == 7
        level = taxonomy_level_index(prediction_string)
        if level <= 0:
            return None
        tokens[1 + level] = ''
        tokens[6] = tokens[level]  # common name = taxon name
        return ';'.join(tokens[:1] + tokens[1:6] + [tokens[level]])

    def ancestor_chain(self, prediction_string):
        """List of ancestor prediction strings, nearest first."""

        out = []
        cur = self.parent_string(prediction_string)
        while cur is not None:
            out.append(cur)
            cur = self.parent_string(cur)
        return out
