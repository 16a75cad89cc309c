#!/bin/bash
# Carve the AFHQ-Cat validation split out of the test split by moving the
# 31 images listed in splits/afhq_cat/validation_images.txt into
# data/afhq_cat/val/cat — the same protocol as the reference
# (scripts/afhq_validation_images.sh:1-24); the split list itself is the
# reference's published selection so val/test membership matches exactly.

val_dir="./data/afhq_cat/val/cat"
val_list_file="splits/afhq_cat/validation_images.txt"

mkdir -p "$val_dir"

while IFS= read -r image_path; do
    if [ -f "$image_path" ]; then
        mv "$image_path" "$val_dir"
        echo "Moved: $image_path"
    else
        echo "File not found: $image_path"
    fi
done < "$val_list_file"

echo "Images have been moved to $val_dir."
