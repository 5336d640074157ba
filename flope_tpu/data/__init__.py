"""Datasets: synthetic ground-truth factory, disk loaders, augmentation."""
