resource "aws_instance" "web" {
  ami           = "ami-0abc"
  instance_type = "t3.micro"
}

resource "aws_s3_bucket" "logs" {
  bucket = "acme-logs"
}

resource "google_storage_bucket" "archive" {
  name     = "acme-archive"
  location = "US"
}

resource "random_pet" "suffix" {
  length = 2
}
