"""
Species-classifier training, TPU-native.

Plays the role of the reference's classifier training stack
(megadetector/classification/train_classifier.py, 827 LoC of torch
training; the reference's detector training is deferred to the external
YOLO repo). Here: an optax-based training loop over the EfficientNetV2
classifier with a jitted, data-parallel train step — batch sharded over a
jax.sharding.Mesh, params replicated, gradients averaged by XLA
collectives over ICI.

Crops come from create_crop_folder (postprocessing/create_crop_folder.py)
or any folder-per-class layout.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from megadetector_tpu.models import efficientnet


class TrainingOptions:
    """Options controlling train()."""

    def __init__(self):
        self.arch = 'efficientnetv2_s'
        self.image_size = 224
        self.batch_size = 64
        self.learning_rate = 1e-3
        self.weight_decay = 1e-5
        self.num_epochs = 10
        self.label_smoothing = 0.1
        self.seed = 0
        self.mesh = None
        self.batch_axis = 'data'
        self.log_every = 50
        self.dtype = 'float32'


def cross_entropy_loss(logits, labels, num_classes, label_smoothing=0.0):
    """Smoothed softmax cross-entropy."""

    one_hot = jax.nn.one_hot(labels, num_classes)
    if label_smoothing > 0:
        one_hot = one_hot * (1.0 - label_smoothing) + \
            label_smoothing / num_classes
    log_probs = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.sum(one_hot * log_probs, axis=-1))


def make_train_step(config, optimizer, label_smoothing=0.0,
                    compute_dtype=jnp.float32):
    """
    Build the jitted train step:
        (params, opt_state, images_u8 [B,S,S,3], labels [B])
        -> (params, opt_state, metrics)
    Pure function of its inputs; shard the batch over a mesh and XLA
    inserts the gradient all-reduce.
    """

    def loss_fn(params, images_u8, labels):
        x = images_u8.astype(jnp.float32) / 255.0
        logits = efficientnet.apply(config, params, x,
                                    dtype=compute_dtype)
        loss = cross_entropy_loss(logits, labels, config.num_classes,
                                  label_smoothing)
        accuracy = jnp.mean(
            (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))
        return loss, accuracy

    def train_step(params, opt_state, images_u8, labels):
        (loss, accuracy), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, images_u8, labels)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return params, opt_state, {'loss': loss, 'accuracy': accuracy}

    return train_step


def make_sharded_train_step(config, optimizer, mesh, batch_axis='data',
                            label_smoothing=0.0,
                            compute_dtype=jnp.float32):
    """Jit the train step with batch sharding over [mesh]."""

    from jax.sharding import NamedSharding, PartitionSpec as P

    step = make_train_step(config, optimizer, label_smoothing,
                           compute_dtype)
    data = NamedSharding(mesh, P(batch_axis))
    replicated = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(replicated, replicated, data, data),
        out_shardings=(replicated, replicated, replicated))


class FolderDataset:
    """
    Folder-per-class image dataset (the crop-folder layout produced by
    the classifier-training prep pipeline). Loads lazily; shuffled
    batches of (uint8 images resized to image_size, int labels).
    """

    def __init__(self, root, image_size=224, seed=0):
        from megadetector_tpu.utils.path_utils import find_images
        self.root = root
        self.image_size = image_size
        self.class_names = sorted(
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d)))
        assert len(self.class_names) > 0, 'No class folders in ' + root
        self.samples = []
        for label, name in enumerate(self.class_names):
            for fn in find_images(os.path.join(root, name),
                                  recursive=True):
                self.samples.append((fn, label))
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.samples)

    def batches(self, batch_size, shuffle=True):
        import cv2
        order = np.arange(len(self.samples))
        if shuffle:
            self.rng.shuffle(order)
        for i in range(0, len(order) - batch_size + 1, batch_size):
            images = []
            labels = []
            for j in order[i:i + batch_size]:
                fn, label = self.samples[j]
                img = cv2.imread(fn)
                if img is None:
                    continue
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                img = cv2.resize(img, (self.image_size, self.image_size))
                images.append(img)
                labels.append(label)
            if len(images) == 0:
                continue
            yield (np.stack(images).astype(np.uint8),
                   np.asarray(labels, np.int32))


def train(crop_folder, output_checkpoint, options=None):
    """
    Train a classifier on a folder-per-class dataset; writes a converted
    checkpoint (npz + metadata) usable by SpeciesClassifier. Returns
    (params, metrics history).
    """

    import optax
    from megadetector_tpu.models.convert_weights import save_checkpoint

    if options is None:
        options = TrainingOptions()

    dataset = FolderDataset(crop_folder, image_size=options.image_size,
                            seed=options.seed)
    num_classes = len(dataset.class_names)
    print('Training on {} images across {} classes'.format(
        len(dataset), num_classes))

    config = efficientnet.EfficientNetConfig(
        options.arch, num_classes=num_classes,
        image_size=options.image_size)
    params = efficientnet.init_params(config, seed=options.seed,
                                      train_init=True)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(options.learning_rate,
                    weight_decay=options.weight_decay))
    opt_state = optimizer.init(params)

    compute_dtype = jnp.bfloat16 if options.dtype in ('bfloat16', 'bf16') \
        else jnp.float32

    if options.mesh is not None:
        step = make_sharded_train_step(
            config, optimizer, options.mesh, options.batch_axis,
            options.label_smoothing, compute_dtype)
    else:
        step = jax.jit(make_train_step(
            config, optimizer, options.label_smoothing, compute_dtype))

    history = []
    i_step = 0
    t_start = time.time()
    for epoch in range(options.num_epochs):
        for images, labels in dataset.batches(options.batch_size):
            params, opt_state, metrics = step(params, opt_state,
                                              images, labels)
            i_step += 1
            if i_step % options.log_every == 0:
                m = jax.device_get(metrics)
                history.append({'step': i_step,
                                'loss': float(m['loss']),
                                'accuracy': float(m['accuracy'])})
                print('step {} loss {:.4f} acc {:.3f} '
                      '({:.1f} img/s)'.format(
                          i_step, float(m['loss']),
                          float(m['accuracy']),
                          i_step * options.batch_size /
                          (time.time() - t_start)))

    params_np = jax.tree_util.tree_map(np.asarray, params)
    save_checkpoint(params_np, output_checkpoint, {
        'arch': options.arch,
        'num_classes': num_classes,
        'class_names': dataset.class_names,
        'image_size': options.image_size,
    })
    print('Saved checkpoint to {}'.format(output_checkpoint))
    return params, history


def main():
    import argparse
    import sys
    parser = argparse.ArgumentParser(
        description='Train a species classifier on a folder-per-class '
                    'crop dataset')
    parser.add_argument('crop_folder')
    parser.add_argument('output_checkpoint')
    parser.add_argument('--arch', default='efficientnetv2_s')
    parser.add_argument('--image_size', type=int, default=224)
    parser.add_argument('--batch_size', type=int, default=64)
    parser.add_argument('--learning_rate', type=float, default=1e-3)
    parser.add_argument('--num_epochs', type=int, default=10)

    if len(sys.argv[1:]) == 0:
        parser.print_help()
        parser.exit()

    args = parser.parse_args()
    options = TrainingOptions()
    options.arch = args.arch
    options.image_size = args.image_size
    options.batch_size = args.batch_size
    options.learning_rate = args.learning_rate
    options.num_epochs = args.num_epochs
    train(args.crop_folder, args.output_checkpoint, options)


if __name__ == '__main__':
    main()
