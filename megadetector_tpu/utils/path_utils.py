"""
Filesystem helpers: enumeration of images/videos, relative-path handling,
hashing, and safe file operations.

Behavioral contract follows the reference toolkit's path layer
(reference: megadetector/utils/path_utils.py, notably find_images at :525
and the image-extension set at :44). Implementation is original.
"""

import glob
import hashlib
import json
import ntpath
import os
import posixpath
import re
import shutil
import string
import unicodedata
import zipfile

from concurrent.futures import ThreadPoolExecutor, ProcessPoolExecutor


#%% Constants

# Extension sets are part of the enumeration contract
# (reference: utils/path_utils.py:44, detection/video_utils.py:35)
IMG_EXTENSIONS = ('.jpg', '.jpeg', '.gif', '.png', '.tif', '.tiff', '.bmp',
                  '.webp', '.avif')

VIDEO_EXTENSIONS = ('.mp4', '.avi', '.mpeg', '.mpg', '.mov', '.mkv', '.flv')

VALID_FILENAME_CHARS = '~-_.() %s%s' % (string.ascii_letters, string.digits)
SEPARATOR_CHARS = r':\/'
VALID_PATH_CHARS = VALID_FILENAME_CHARS + SEPARATOR_CHARS
CHAR_LIMIT = 255


#%% Enumeration


def recursive_file_list(base_dir, convert_slashes=True,
                        return_relative_paths=False, sort_files=True,
                        recursive=True):
    """
    List all files under [base_dir]. Forward slashes by default; sorted.
    """

    assert os.path.isdir(base_dir), '{} is not a folder'.format(base_dir)

    all_files = []
    if recursive:
        for root, _, files in os.walk(base_dir):
            for fn in files:
                all_files.append(os.path.join(root, fn))
    else:
        for fn in os.listdir(base_dir):
            full = os.path.join(base_dir, fn)
            if os.path.isfile(full):
                all_files.append(full)

    if return_relative_paths:
        all_files = [os.path.relpath(fn, base_dir) for fn in all_files]
    if convert_slashes:
        all_files = [fn.replace('\\', '/') for fn in all_files]
    if sort_files:
        all_files = sorted(all_files)
    return all_files


def file_list(base_dir, convert_slashes=True, return_relative_paths=False,
              sort_files=True, recursive=False):
    """Alias for recursive_file_list with recursion off by default."""

    return recursive_file_list(base_dir, convert_slashes=convert_slashes,
                               return_relative_paths=return_relative_paths,
                               sort_files=sort_files, recursive=recursive)


def is_image_file(s, img_extensions=IMG_EXTENSIONS):
    """True if the filename [s] has an image extension (case-insensitive)."""

    return os.path.splitext(s)[1].lower() in img_extensions


def find_image_strings(strings):
    """Subset of [strings] that look like image filenames."""

    return [s for s in strings if is_image_file(s)]


def find_images(dirname, recursive=False, return_relative_paths=False,
                convert_slashes=True):
    """
    Find image files in [dirname]. Sorted; forward slashes by default;
    absolute paths unless return_relative_paths
    (reference semantics: utils/path_utils.py:525-560).
    """

    assert os.path.isdir(dirname), '{} is not a folder'.format(dirname)

    pattern = os.path.join(dirname, '**', '*.*') if recursive \
        else os.path.join(dirname, '*.*')
    candidates = glob.glob(pattern, recursive=recursive)
    images = find_image_strings(candidates)

    if return_relative_paths:
        images = [os.path.relpath(fn, dirname) for fn in images]
    images = sorted(images)
    if convert_slashes:
        images = [fn.replace('\\', '/') for fn in images]
    return images


def is_video_file(s, video_extensions=VIDEO_EXTENSIONS):
    """True if the filename [s] has a video extension (case-insensitive)."""

    return os.path.splitext(s)[1].lower() in video_extensions


def find_video_strings(strings):
    """Subset of [strings] that look like video filenames."""

    return [s for s in strings if is_video_file(s)]


def find_videos(dirname, recursive=False, return_relative_paths=False,
                convert_slashes=True):
    """Find video files in [dirname]; same conventions as find_images."""

    assert os.path.isdir(dirname), '{} is not a folder'.format(dirname)

    pattern = os.path.join(dirname, '**', '*.*') if recursive \
        else os.path.join(dirname, '*.*')
    candidates = glob.glob(pattern, recursive=recursive)
    videos = find_video_strings(candidates)

    if return_relative_paths:
        videos = [os.path.relpath(fn, dirname) for fn in videos]
    videos = sorted(videos)
    if convert_slashes:
        videos = [fn.replace('\\', '/') for fn in videos]
    return videos


#%% Path manipulation


def insert_before_extension(filename, s=None, separator='.'):
    """
    'a/b.jpg' + 'x' -> 'a/b.x.jpg'. When [s] is None, inserts a timestamp.
    """

    if s is None or len(s) == 0:
        import datetime
        s = datetime.datetime.now().strftime('%Y.%m.%d.%H.%M.%S')
    base, ext = os.path.splitext(filename)
    return '{}{}{}{}'.format(base, separator, s, ext)


def split_path(path):
    """Split a path into all of its components."""

    parts = []
    while True:
        head, tail = os.path.split(path)
        if tail:
            parts.insert(0, tail)
            path = head
        else:
            if head:
                parts.insert(0, head)
            break
    return parts


def path_is_abs(p):
    """True for absolute paths on either POSIX or Windows conventions."""

    return posixpath.isabs(p) or ntpath.isabs(p) or re.match(r'^[A-Za-z]:', p)


def safe_create_link(link_exists, link_new):
    """Create a symlink link_new -> link_exists, replacing a stale one."""

    if os.path.lexists(link_new):
        if os.path.islink(link_new) and os.readlink(link_new) == link_exists:
            return
        os.remove(link_new)
    os.symlink(link_exists, link_new)


def top_level_folder(p):
    """First path component of [p] ('a/b/c' -> 'a'; absolute kept)."""

    parts = split_path(p)
    if len(parts) == 0:
        return ''
    # For absolute paths, include the root with the first component
    if parts[0] in ('/', '\\') and len(parts) > 1:
        return os.path.join(parts[0], parts[1])
    return parts[0]


def clean_filename(filename, allow_list=VALID_FILENAME_CHARS,
                   char_limit=CHAR_LIMIT, force_lower=False,
                   remove_trailing_leading_whitespace=True,
                   replace_whitespace=None):
    """Strip invalid filename characters; optionally lower-case and trim."""

    s = filename
    if remove_trailing_leading_whitespace:
        s = s.strip()
    if replace_whitespace is not None:
        s = re.sub(r'\s', replace_whitespace, s)
    s = unicodedata.normalize('NFKD', s).encode('ASCII', 'ignore').decode()
    s = ''.join(c for c in s if c in allow_list)
    if force_lower:
        s = s.lower()
    return s[:char_limit]


def clean_path(pathname, allow_list=VALID_PATH_CHARS,
               char_limit=CHAR_LIMIT, force_lower=False):
    """clean_filename that preserves path separators."""

    return clean_filename(pathname, allow_list=allow_list,
                          char_limit=char_limit, force_lower=force_lower)


def flatten_path(pathname, separator_chars=SEPARATOR_CHARS,
                 separator_char_replacement='~'):
    """Replace path separators with [separator_char_replacement]."""

    s = pathname
    for c in separator_chars:
        s = s.replace(c, separator_char_replacement)
    return s


#%% Hashing / file ops


def compute_file_hash(file_path, algorithm='sha256', allow_failures=True):
    """Hash a file's contents; returns hex digest or None on failure."""

    try:
        h = hashlib.new(algorithm)
        with open(file_path, 'rb') as f:
            for chunk in iter(lambda: f.read(1 << 20), b''):
                h.update(chunk)
        return h.hexdigest()
    except Exception:
        if allow_failures:
            return None
        raise


def parallel_compute_file_hashes(filenames, algorithm='sha256',
                                 max_workers=16, use_threads=True,
                                 verbose=False):
    """Hash many files in parallel; returns {filename: digest-or-None}."""

    pool_cls = ThreadPoolExecutor if use_threads else ProcessPoolExecutor
    with pool_cls(max_workers=max_workers) as pool:
        digests = list(pool.map(
            lambda fn: compute_file_hash(fn, algorithm=algorithm), filenames))
    return dict(zip(filenames, digests))


def copy_file(src, dst, overwrite=True, verbose=False, move=False):
    """Copy (or move) a file, creating destination folders as needed."""

    if not overwrite and os.path.exists(dst):
        return dst
    dst_dir = os.path.dirname(dst)
    if len(dst_dir) > 0:
        os.makedirs(dst_dir, exist_ok=True)
    if move:
        shutil.move(src, dst)
    else:
        shutil.copy2(src, dst)
    return dst


def parallel_copy_files(input_file_to_output_file, max_workers=16,
                        use_threads=True, overwrite=False, verbose=False,
                        move=False):
    """Copy many files in parallel given a {src: dst} mapping."""

    pool_cls = ThreadPoolExecutor if use_threads else ProcessPoolExecutor
    items = list(input_file_to_output_file.items())
    with pool_cls(max_workers=max_workers) as pool:
        list(pool.map(lambda kv: copy_file(
            kv[0], kv[1], overwrite=overwrite, move=move), items))


def delete_file(filename, verbose=False):
    """Delete a file if it exists; never raises for a missing file."""

    try:
        os.remove(filename)
        return True
    except FileNotFoundError:
        return False


def write_list_to_file(output_file, strings):
    """Write a list of strings to a file, one per line (or .json)."""

    if output_file.endswith('.json'):
        with open(output_file, 'w', newline='\n') as f:
            json.dump(strings, f, indent=1)
    else:
        with open(output_file, 'w', newline='\n') as f:
            for s in strings:
                f.write('{}\n'.format(s))


def read_list_from_file(filename):
    """Read a list of strings from a newline-delimited file or .json list."""

    if filename.endswith('.json'):
        with open(filename, 'r') as f:
            out = json.load(f)
        assert isinstance(out, list)
        return out
    with open(filename, 'r') as f:
        return [line.strip() for line in f if len(line.strip()) > 0]


def zip_file(input_fn, output_fn=None, overwrite=True,
             compress_level=9, verbose=False):
    """Zip a single file; returns the zipfile path."""

    if output_fn is None:
        output_fn = input_fn + '.zip'
    if not overwrite and os.path.exists(output_fn):
        return output_fn
    with zipfile.ZipFile(output_fn, 'w', zipfile.ZIP_DEFLATED,
                         compresslevel=compress_level) as zf:
        zf.write(input_fn, arcname=os.path.basename(input_fn))
    return output_fn


def unzip_file(input_file, output_folder=None):
    """Unzip an archive (defaults to a folder named after the zip)."""

    if output_folder is None:
        output_folder = os.path.splitext(input_file)[0]
    os.makedirs(output_folder, exist_ok=True)
    with zipfile.ZipFile(input_file, 'r') as zf:
        zf.extractall(output_folder)
    return output_folder


def get_file_sizes(base_dir, convert_slashes=True):
    """{relative filename: size in bytes} for all files under [base_dir]."""

    files = recursive_file_list(base_dir, convert_slashes=convert_slashes,
                                return_relative_paths=True)
    return {fn: os.path.getsize(os.path.join(base_dir, fn)) for fn in files}


def fileparts(path):
    """'c/d/file.jpg' -> ('c/d', 'file', '.jpg')."""

    folder = os.path.dirname(path)
    base, ext = os.path.splitext(os.path.basename(path))
    return folder, base, ext
