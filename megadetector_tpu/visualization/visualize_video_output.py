"""
Render video-level detection results back onto videos: draw per-frame
boxes on the sampled frames and re-encode an annotated video (or frame
folder).

Behavioral contract follows the reference
(megadetector/visualization/visualize_video_output.py:623).
"""

import argparse
import json
import os
import sys

from collections import defaultdict

from tqdm import tqdm

from megadetector_tpu.visualization import visualization_utils as vis_utils


def visualize_video_output(video_results_file, input_video_folder,
                           output_folder, confidence_threshold=0.2,
                           fourcc='mp4v', render_frames_only=False,
                           sample=-1):
    """
    For each video in [video_results_file], draw its detections on the
    corresponding frames and write an annotated video (or frame folder)
    under [output_folder]. Returns the list of outputs written.
    """

    import cv2
    import numpy as np
    from PIL import Image

    with open(video_results_file) as f:
        data = json.load(f)
    detection_categories = data.get('detection_categories', {})

    videos = [im for im in data['images']
              if im.get('detections') is not None]
    if sample > 0:
        videos = videos[:sample]

    os.makedirs(output_folder, exist_ok=True)
    outputs = []

    for im in tqdm(videos, desc='Rendering videos'):

        video_path = os.path.join(input_video_folder, im['file'])
        if not os.path.isfile(video_path):
            print('Warning: video {} not found'.format(video_path))
            continue

        frame_to_detections = defaultdict(list)
        for det in im['detections']:
            if det['conf'] >= confidence_threshold and \
                    'frame_number' in det:
                frame_to_detections[det['frame_number']].append(det)

        vidcap = cv2.VideoCapture(video_path)
        if not vidcap.isOpened():
            continue
        fs = vidcap.get(cv2.CAP_PROP_FPS)
        if not fs or fs <= 0:
            # Some containers report 0 FPS; a zero-FPS VideoWriter
            # silently produces an unplayable file
            fs = 30.0
        width = int(vidcap.get(cv2.CAP_PROP_FRAME_WIDTH))
        height = int(vidcap.get(cv2.CAP_PROP_FRAME_HEIGHT))

        out_name = im['file'].replace('/', '~').replace('\\', '~')
        if render_frames_only:
            frame_dir = os.path.join(output_folder,
                                     os.path.splitext(out_name)[0])
            os.makedirs(frame_dir, exist_ok=True)
            writer = None
        else:
            out_path = os.path.join(
                output_folder,
                os.path.splitext(out_name)[0] + '_annotated.mp4')
            writer = cv2.VideoWriter(
                out_path, cv2.VideoWriter_fourcc(*fourcc), fs,
                (width, height))
            outputs.append(out_path)

        frame_number = -1
        while True:
            success, frame = vidcap.read()
            if not success:
                break
            frame_number += 1
            dets = frame_to_detections.get(frame_number, [])
            if dets:
                pil = Image.fromarray(
                    cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
                vis_utils.render_detection_bounding_boxes(
                    dets, pil, label_map=detection_categories,
                    confidence_threshold=confidence_threshold)
                frame = cv2.cvtColor(np.asarray(pil),
                                     cv2.COLOR_RGB2BGR)
            if writer is not None:
                writer.write(frame)
            elif dets:
                frame_path = os.path.join(
                    frame_dir, 'frame{:06d}.jpg'.format(frame_number))
                cv2.imwrite(frame_path, frame)
                outputs.append(frame_path)

        vidcap.release()
        if writer is not None:
            writer.release()

    print('Wrote {} annotated outputs to {}'.format(
        len(outputs), output_folder))
    return outputs


def main():
    parser = argparse.ArgumentParser(
        description='Render detections onto videos')
    parser.add_argument('video_results_file')
    parser.add_argument('input_video_folder')
    parser.add_argument('output_folder')
    parser.add_argument('--confidence_threshold', type=float, default=0.2)
    parser.add_argument('--frames_only', action='store_true')

    if len(sys.argv[1:]) == 0:
        parser.print_help()
        parser.exit()

    args = parser.parse_args()
    visualize_video_output(
        args.video_results_file, args.input_video_folder,
        args.output_folder,
        confidence_threshold=args.confidence_threshold,
        render_frames_only=args.frames_only)


if __name__ == '__main__':
    main()
