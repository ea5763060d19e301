from explainable_spatial_vqa_tpu.cli.main import main

main()
