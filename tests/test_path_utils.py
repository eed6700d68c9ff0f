"""Unit tests for path utilities (thin-coverage fill)."""

import os

import pytest

from megadetector_tpu.utils import path_utils


def test_is_image_and_video_file():
    assert path_utils.is_image_file('a/b/photo.JPG')
    assert path_utils.is_image_file('x.webp')
    assert not path_utils.is_image_file('x.txt')
    assert path_utils.is_video_file('clip.MP4')
    assert not path_utils.is_video_file('clip.jpg')


def test_find_images_and_videos(tmp_path):
    (tmp_path / 'sub').mkdir()
    for fn in ['a.jpg', 'b.PNG', 'c.txt', 'sub/d.jpeg', 'sub/e.mp4']:
        p = tmp_path / fn
        p.write_bytes(b'x')

    flat = path_utils.find_images(str(tmp_path))
    assert [os.path.basename(f) for f in flat] == ['a.jpg', 'b.PNG']

    recursive = path_utils.find_images(str(tmp_path), recursive=True,
                                       return_relative_paths=True)
    assert recursive == ['a.jpg', 'b.PNG', 'sub/d.jpeg']

    videos = path_utils.find_videos(str(tmp_path), recursive=True,
                                    return_relative_paths=True)
    assert videos == ['sub/e.mp4']


def test_recursive_file_list(tmp_path):
    (tmp_path / 'x').mkdir()
    (tmp_path / 'x' / 'f1').write_text('1')
    (tmp_path / 'f2').write_text('2')
    files = path_utils.recursive_file_list(str(tmp_path),
                                           return_relative_paths=True)
    assert files == ['f2', 'x/f1']
    flat = path_utils.file_list(str(tmp_path),
                                return_relative_paths=True)
    assert flat == ['f2']


def test_insert_before_extension():
    assert path_utils.insert_before_extension('a/b.jpg', 'x') == \
        'a/b.x.jpg'
    out = path_utils.insert_before_extension('a/b.jpg')
    assert out.startswith('a/b.') and out.endswith('.jpg')


def test_split_and_top_level():
    assert path_utils.split_path('a/b/c.jpg') == ['a', 'b', 'c.jpg']
    assert path_utils.top_level_folder('a/b/c.jpg') == 'a'
    assert path_utils.path_is_abs('/x/y')
    assert path_utils.path_is_abs('c:\\x')
    assert not path_utils.path_is_abs('x/y')


def test_clean_and_flatten():
    assert path_utils.clean_filename('a b?.jpg') == 'a b.jpg'
    assert path_utils.clean_filename('a b.jpg',
                                     replace_whitespace='_') == 'a_b.jpg'
    assert path_utils.flatten_path('a/b\\c:d') == 'a~b~c~d'


def test_hash_and_file_ops(tmp_path):
    f = tmp_path / 'data.bin'
    f.write_bytes(b'hello world')
    h = path_utils.compute_file_hash(str(f))
    assert h == path_utils.compute_file_hash(str(f))
    assert path_utils.compute_file_hash(str(tmp_path / 'nope')) is None

    dst = str(tmp_path / 'sub' / 'copy.bin')
    path_utils.copy_file(str(f), dst)
    assert os.path.isfile(dst)

    assert path_utils.delete_file(dst)
    assert not path_utils.delete_file(dst)  # already gone


def test_list_files_round_trip(tmp_path):
    txt = str(tmp_path / 'list.txt')
    path_utils.write_list_to_file(txt, ['a', 'b'])
    assert path_utils.read_list_from_file(txt) == ['a', 'b']
    js = str(tmp_path / 'list.json')
    path_utils.write_list_to_file(js, ['a', 'b'])
    assert path_utils.read_list_from_file(js) == ['a', 'b']


def test_zip_round_trip(tmp_path):
    f = tmp_path / 'payload.txt'
    f.write_text('payload')
    z = path_utils.zip_file(str(f))
    assert z.endswith('.zip') and os.path.isfile(z)
    out = path_utils.unzip_file(z, str(tmp_path / 'out'))
    assert open(os.path.join(out, 'payload.txt')).read() == 'payload'


def test_fileparts():
    assert path_utils.fileparts('c/d/file.jpg') == ('c/d', 'file', '.jpg')
