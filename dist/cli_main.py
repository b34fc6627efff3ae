from pagerank_service_spark.cli import main
import sys
sys.exit(main())
