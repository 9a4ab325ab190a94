terraform {
  required_version = ">= 1.3.0, < 2.0.0"

  required_providers {
    aws = {
      source                = "hashicorp/aws"
      version               = "~> 5.0"
      configuration_aliases = [aws.east]
    }

    # legacy single-string constraint form (pre-0.13 syntax, still valid)
    random = ">= 2.7.0"

    # block form without a version constraint: source-pinned but
    # version-unpinned
    external = {
      source = "hashicorp/external"
    }
  }
}
