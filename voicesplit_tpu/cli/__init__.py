"""Command-line drivers mirroring the reference's entry scripts.

  python -m voicesplit_tpu.cli.train      -c config.json [--checkpoint_path ...]
  python -m voicesplit_tpu.cli.test       --checkpoint_path ... [-c config.json]
  python -m voicesplit_tpu.cli.sweep      --checkpoints_path dir [--fast]
  python -m voicesplit_tpu.cli.preprocess -c config.json -r root -d train.csv ...
  python -m voicesplit_tpu.cli.extract_embeddings --data_dir dir [...]
  python -m voicesplit_tpu.cli.convert    --input_dir specs/ --output_dir wavs/
  python -m voicesplit_tpu.cli.import_torch --torch_checkpoint ckpt.pt --output_dir d/
"""
