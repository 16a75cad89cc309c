"""Trainers: flow matching + gradient-step denoiser."""
