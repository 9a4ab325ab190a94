provider "aws" {
  region = "us-west-2"
  default_tags {
    tags = {
      Owner = "platform"
      Env   = "prod"
    }
  }
}

provider "aws" {
  alias  = "legacy"
  region = "us-east-1"
}

resource "aws_instance" "r1" {
  tags = {
    Name = "r1"
  }
}

resource "aws_s3_bucket" "r2" {
  bucket = "audit-demo-bucket"
}

resource "aws_instance" "r3" {
  provider = aws.legacy

  tags = {
    Name = "r3"
  }
}

resource "google_storage_bucket" "r4" {
  name = "gcs-demo"
}
