"""
Tests for the video pipeline and tiled inference, using the tiny
random-weight checkpoint.
"""

import json
import os

import numpy as np
import pytest

from PIL import Image

from megadetector_tpu.models import yolov5
from megadetector_tpu.models.convert_weights import save_checkpoint

cv2 = pytest.importorskip('cv2')


@pytest.fixture(scope='module')
def tiny_checkpoint(tmp_path_factory):
    folder = tmp_path_factory.mktemp('model')
    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    params = yolov5.init_params(cfg, seed=7)
    path = str(folder / 'md_test.npz')
    save_checkpoint(params, path, {
        'model_version_string': 'v5a.0.1', 'arch': 'yolov5n',
        'model_type': 'yolov5', 'num_classes': 3,
        'class_names': ['animal', 'person', 'vehicle'],
        'image_size': 64, 'strides': [8, 16, 32],
        'anchors': cfg.anchors.tolist(),
    })
    return path


@pytest.fixture(scope='module')
def video_folder(tmp_path_factory):
    """A folder with two tiny synthetic videos and one corrupt file."""

    folder = tmp_path_factory.mktemp('videos')
    rng = np.random.RandomState(0)
    for name, n_frames, fps in [('vid_a.mp4', 12, 6.0),
                                ('vid_b.mp4', 8, 4.0)]:
        path = str(folder / name)
        fourcc = cv2.VideoWriter_fourcc(*'mp4v')
        out = cv2.VideoWriter(path, fourcc, fps, (64, 48))
        assert out.isOpened()
        for _ in range(n_frames):
            out.write(rng.randint(0, 255, (48, 64, 3), dtype=np.uint8))
        out.release()
    with open(str(folder / 'corrupt.mp4'), 'wb') as f:
        f.write(b'not a video')
    return str(folder)


#%% video_utils


def test_frame_naming_round_trip():
    from megadetector_tpu.detection.video_utils import (
        _frame_number_to_filename, _filename_to_frame_number)
    assert _frame_number_to_filename(7) == 'frame000007.jpg'
    assert _filename_to_frame_number('x/y/frame000123.jpg') == 123
    with pytest.raises(ValueError):
        _filename_to_frame_number('notaframe.jpg')


def test_get_video_fs(video_folder):
    from megadetector_tpu.detection.video_utils import get_video_fs
    fs = get_video_fs(os.path.join(video_folder, 'vid_a.mp4'))
    assert fs == pytest.approx(6.0, abs=0.1)


def test_run_callback_on_frames_sampling(video_folder):
    from megadetector_tpu.detection.video_utils import (
        run_callback_on_frames)
    seen = []

    def cb(img, frame_id):
        assert img.ndim == 3 and img.shape[2] == 3
        seen.append(frame_id)
        return {'file': frame_id, 'detections': []}

    out = run_callback_on_frames(
        os.path.join(video_folder, 'vid_a.mp4'), cb, every_n_frames=3)
    assert out['frame_rate'] == pytest.approx(6.0, abs=0.1)
    # 12 frames, every 3rd: frames 0,3,6,9
    assert seen == ['frame000000.jpg', 'frame000003.jpg',
                    'frame000006.jpg', 'frame000009.jpg']


def test_time_sampling_conversion(video_folder):
    from megadetector_tpu.detection.video_utils import (
        run_callback_on_frames)
    seen = []

    def cb(img, frame_id):
        seen.append(frame_id)
        return {'file': frame_id, 'detections': []}

    # 1 second at 6 fps -> every 6th frame: 0, 6
    run_callback_on_frames(os.path.join(video_folder, 'vid_a.mp4'), cb,
                           every_n_frames=-1.0)
    assert seen == ['frame000000.jpg', 'frame000006.jpg']


def test_video_to_frames(video_folder, tmp_path):
    from megadetector_tpu.detection.video_utils import video_to_frames
    out_dir = str(tmp_path / 'frames')
    frame_files, fs = video_to_frames(
        os.path.join(video_folder, 'vid_b.mp4'), out_dir,
        every_n_frames=2)
    assert len(frame_files) == 4  # 8 frames, every 2nd
    assert all(os.path.isfile(f) for f in frame_files)


def test_process_videos_end_to_end(tiny_checkpoint, video_folder,
                                   tmp_path):
    from megadetector_tpu.detection.process_video import (
        ProcessVideoOptions, process_videos)

    options = ProcessVideoOptions()
    options.model_file = tiny_checkpoint
    options.input_video_file = video_folder
    options.output_json_file = str(tmp_path / 'video_results.json')
    options.frame_sample = 4
    options.frame_batch_size = 4
    process_videos(options)

    with open(options.output_json_file) as f:
        data = json.load(f)

    assert data['info']['format_version'] == '1.6'
    by_file = {im['file']: im for im in data['images']}
    assert set(by_file.keys()) == {'vid_a.mp4', 'vid_b.mp4', 'corrupt.mp4'}

    corrupt = by_file['corrupt.mp4']
    assert corrupt['detections'] is None
    assert corrupt['frame_rate'] == -1.0
    assert 'failure' in corrupt

    vid_a = by_file['vid_a.mp4']
    assert vid_a['frame_rate'] == pytest.approx(6.0, abs=0.1)
    assert vid_a['frames_processed'] == [0, 4, 8]
    for det in vid_a['detections']:
        assert det['frame_number'] in (0, 4, 8)

    vid_b = by_file['vid_b.mp4']
    assert vid_b['frames_processed'] == [0, 4]


def test_frame_results_to_video_results(tmp_path):
    from megadetector_tpu.detection.video_utils import (
        frame_results_to_video_results)
    frame_data = {
        'images': [
            {'file': 'v1.mp4/frame000000.jpg',
             'detections': [{'category': '1', 'conf': 0.9,
                             'bbox': [0.1, 0.1, 0.2, 0.2]}]},
            {'file': 'v1.mp4/frame000004.jpg', 'detections': []},
            {'file': 'v2.mp4/frame000000.jpg', 'detections': []},
        ],
        'detection_categories': {'1': 'animal'},
        'info': {'format_version': '1.6'},
    }
    input_file = str(tmp_path / 'frames.json')
    output_file = str(tmp_path / 'videos.json')
    with open(input_file, 'w') as f:
        json.dump(frame_data, f)
    out = frame_results_to_video_results(input_file, output_file,
                                         fs_default=5.0)
    by_file = {im['file']: im for im in out['images']}
    assert by_file['v1.mp4']['frames_processed'] == [0, 4]
    assert by_file['v1.mp4']['detections'][0]['frame_number'] == 0
    assert by_file['v2.mp4']['detections'] == []


#%% Tiled inference


def test_get_patch_boundaries_reference_example():
    from megadetector_tpu.detection.run_tiled_inference import (
        get_patch_boundaries)
    # The reference docstring example: width 15, patch 10, stride 10
    # -> starts at 0 and 5
    positions = get_patch_boundaries((15, 10), (10, 10),
                                     patch_stride=(10, 10))
    assert positions == [[0, 0], [5, 0]]


def test_get_patch_boundaries_50pct_overlap():
    from megadetector_tpu.detection.run_tiled_inference import (
        get_patch_boundaries)
    positions = get_patch_boundaries((256, 128), (128, 128))
    # x starts: 0, 64, 128; y starts: 0
    assert positions == [[0, 0], [64, 0], [128, 0]]
    # Full coverage: last patch ends at image edge
    assert positions[-1][0] + 128 == 256


def test_get_patch_boundaries_exact_fit():
    from megadetector_tpu.detection.run_tiled_inference import (
        get_patch_boundaries)
    positions = get_patch_boundaries((128, 128), (128, 128))
    assert positions == [[0, 0]]


def test_in_place_nms():
    from megadetector_tpu.detection.run_tiled_inference import in_place_nms
    results = {'images': [{
        'file': 'a.jpg',
        'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.2, 0.2]},
            {'category': '1', 'conf': 0.8,
             'bbox': [0.105, 0.105, 0.2, 0.2]},  # duplicate of the first
            {'category': '2', 'conf': 0.7, 'bbox': [0.6, 0.6, 0.1, 0.1]},
        ]}]}
    in_place_nms(results, iou_thres=0.45)
    dets = results['images'][0]['detections']
    assert len(dets) == 2
    assert dets[0]['conf'] == 0.9
    assert dets[1]['conf'] == 0.7


def test_run_tiled_inference_end_to_end(tiny_checkpoint, tmp_path):
    from megadetector_tpu.detection.run_tiled_inference import (
        run_tiled_inference)

    image_folder = str(tmp_path / 'images')
    os.makedirs(image_folder)
    rng = np.random.RandomState(1)
    # One image bigger than the tile, one smaller
    Image.fromarray(rng.randint(0, 255, (200, 300, 3), dtype=np.uint8)) \
        .save(os.path.join(image_folder, 'big.jpg'))
    Image.fromarray(rng.randint(0, 255, (60, 80, 3), dtype=np.uint8)) \
        .save(os.path.join(image_folder, 'small.jpg'))

    output_file = str(tmp_path / 'tiled_results.json')
    run_tiled_inference(
        tiny_checkpoint, image_folder, str(tmp_path / 'tiles'),
        output_file, tile_size_x=128, tile_size_y=128,
        batch_size=4, detection_threshold=0.3)

    with open(output_file) as f:
        data = json.load(f)
    by_file = {im['file']: im for im in data['images']}
    assert set(by_file.keys()) == {'big.jpg', 'small.jpg'}
    for im in data['images']:
        assert im['detections'] is not None
        for det in im['detections']:
            x, y, w, h = det['bbox']
            assert -0.001 <= x and x + w <= 1.001
            assert -0.001 <= y and y + h <= 1.001


def test_tiled_stride_validation():
    """tile_overlap ~1.0 resolves to a zero stride and must be
    rejected instead of looping forever."""

    from megadetector_tpu.detection.run_tiled_inference import \
        get_patch_boundaries
    with pytest.raises(AssertionError, match='stride'):
        get_patch_boundaries((512, 512), (128, 128), patch_stride=0.0)


def test_tiled_checkpoint_resume(tiny_checkpoint, tmp_path):
    """run_tiled_inference writes checkpoints, resumes past completed
    images, and deletes the checkpoint on success."""

    import numpy as np
    from PIL import Image
    from megadetector_tpu.detection.run_tiled_inference import \
        run_tiled_inference

    folder = tmp_path / 'imgs'
    folder.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (200, 260, 3),
                                    dtype=np.uint8)).save(
            str(folder / 'im_{}.jpg'.format(i)))

    ckpt = str(tmp_path / 'tiled_checkpoint.json')
    out_file = str(tmp_path / 'tiled.json')
    run_tiled_inference(
        tiny_checkpoint, str(folder), str(tmp_path / 'tiles'), out_file,
        tile_size_x=128, tile_size_y=128, batch_size=4,
        checkpoint_path=ckpt, checkpoint_frequency=1,
        detector_options={'use_mesh': 'false'})
    assert not os.path.isfile(ckpt)  # deleted on success
    with open(out_file) as f:
        done = json.load(f)
    assert len(done['images']) == 3

    # Simulate a crash: seed a checkpoint with one finished image and
    # confirm the rerun skips it
    from megadetector_tpu.detection import run_detector_batch
    run_detector_batch.write_checkpoint(
        ckpt, [dict(done['images'][0],
                    file=done['images'][0]['file'])])
    out2 = str(tmp_path / 'tiled2.json')
    run_tiled_inference(
        tiny_checkpoint, str(folder), str(tmp_path / 'tiles'), out2,
        tile_size_x=128, tile_size_y=128, batch_size=4,
        checkpoint_path=ckpt, checkpoint_frequency=1,
        detector_options={'use_mesh': 'false'})
    with open(out2) as f:
        resumed = json.load(f)
    assert len(resumed['images']) == 3
