provider "aws" {
  region = "us-west-2"
}

# configured and used but absent from required_providers: the
# unconstrained drift time-bomb
provider "google" {
  project = "acme-analytics"
}
