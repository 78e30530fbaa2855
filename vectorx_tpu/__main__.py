from .services.entrypoint import main
import sys

sys.exit(main())
