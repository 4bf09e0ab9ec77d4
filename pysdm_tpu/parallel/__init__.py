"""multi-device scaling layer: device meshes, sharded state, halo exchange,
particle migration (SURVEY.md §2.5 distributed mapping)"""
