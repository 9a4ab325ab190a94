resource "aws_instance" "a" {
  provider      = aws.west
  instance_type = "t3.micro"
}

resource "aws_instance" "b" {
  provider      = aws.east
  instance_type = "t3.micro"
}

resource "aws_s3_bucket" "c" {
  bucket = "alias-audit-demo"
}

resource "google_storage_bucket" "d" {
  name = "gcs-demo"
}

resource "azurerm_storage_account" "e" {
  name = "storacct"
}
