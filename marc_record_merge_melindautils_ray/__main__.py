from marc_record_merge_melindautils_ray.cli import main

raise SystemExit(main())
