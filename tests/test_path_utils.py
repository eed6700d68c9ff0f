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


def test_folder_utilities(tmp_path):
    from megadetector_tpu.utils import path_utils as pu

    (tmp_path / 'a' / 'b').mkdir(parents=True)
    (tmp_path / 'c').mkdir()
    (tmp_path / 'a' / 'x.jpg').write_bytes(b'1')
    (tmp_path / 'a' / 'y.txt').write_bytes(b'2')

    folders = pu.folder_list(str(tmp_path), return_relative_paths=True)
    assert folders == ['a', 'c']
    folders_r = pu.folder_list(str(tmp_path),
                               return_relative_paths=True,
                               recursive=True)
    assert 'a/b' in folders_r

    summary = pu.folder_summary(str(tmp_path), print_summary=False)
    assert summary['n_files'] == 2
    assert summary['extension_to_count']['.jpg'] == 1

    # b and c are empty -> removed; a keeps its files
    pu.remove_empty_folders(str(tmp_path))
    assert not (tmp_path / 'a' / 'b').exists()
    assert not (tmp_path / 'c').exists()
    assert (tmp_path / 'a' / 'x.jpg').exists()

    assert pu.path_join('a', 'b', 'c.jpg') == 'a/b/c.jpg'
    assert pu.test_file_write(str(tmp_path / 'w.txt'))


def test_get_file_sizes(tmp_path):
    from megadetector_tpu.utils import path_utils as pu

    folder = tmp_path / 'sizes'
    (folder / 'sub').mkdir(parents=True)
    (folder / 'a.txt').write_text('x' * 10)
    (folder / 'sub' / 'b.txt').write_text('y' * 25)

    # Folder form: relative paths by default
    sizes = pu.get_file_sizes(str(folder))
    assert sizes == {'a.txt': 10, 'sub/b.txt': 25}
    # Non-recursive
    assert pu.get_file_sizes(str(folder), recursive=False) == \
        {'a.txt': 10}
    # List form: keys as given, errors -> None
    lst = [str(folder / 'a.txt'), str(folder / 'missing.txt')]
    sizes = pu.get_file_sizes(lst)
    assert sizes[str(folder / 'a.txt').replace('\\', '/')] == 10
    assert sizes[str(folder / 'missing.txt').replace('\\', '/')] is None
    # Worker pool path agrees with serial
    assert pu.get_file_sizes(str(folder), max_workers=2) == \
        {'a.txt': 10, 'sub/b.txt': 25}


def test_zip_tar_utilities(tmp_path):
    import tarfile
    import zipfile
    from megadetector_tpu.utils import path_utils as pu

    folder = tmp_path / 'data'
    folder.mkdir()
    for i in range(3):
        (folder / 'f{}.txt'.format(i)).write_text('x' * 100)

    z = pu.zip_folder(str(folder))
    with zipfile.ZipFile(z) as zf:
        assert len(zf.namelist()) == 3

    single = pu.zip_files_into_single_zipfile(
        [str(folder / 'f0.txt'), str(folder / 'f1.txt')],
        str(tmp_path / 'both.zip'))
    with zipfile.ZipFile(single) as zf:
        assert sorted(zf.namelist()) == ['f0.txt', 'f1.txt']

    tar = pu.add_files_to_single_tar_file(
        [str(folder / 'f2.txt')], str(tmp_path / 'one.tar'),
        str(folder))
    with tarfile.open(tar) as tf:
        assert tf.getnames() == ['f2.txt']

    zips = pu.zip_each_file_in_folder(str(folder))
    assert len(zips) == 3

    pu.parallel_delete_files(zips)
    assert not any(os.path.isfile(z) for z in zips)
